"""Differentiable image sampling and forward splatting on TPU.

XLA has no native `grid_sample`; the bilinear warp used throughout the
self-supervised losses (reference: trainer_end_to_end_video.py:861,
utils/layers.py:406-426,496-519) is implemented here as a vectorised
4-corner gather, and the forward-splat occupancy map
(utils/layers.py:552-605, a CUDA `scatter_add_`) as a batched XLA
scatter-add — both deterministic and jit/vmap/grad friendly.

All images are channels-last ``[B, H, W, C]``; flow fields follow the
reference's ``(dy, dx)`` channel order; normalized grids use ``(x, y)``
like `torch.nn.functional.grid_sample`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from endodav_tpu.utils.envflags import env_on

__all__ = [
    "grid_sample",
    "flow_to_grid",
    "flow_warp",
    "forward_splat_occupancy",
    "occlusion_mask_backward",
    "flow_consistency",
]


def _gather_hw(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, iy, ix, :] for integer index maps of shape [B, Ho, Wo]."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = (iy * w + ix).reshape(b, -1)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out.reshape(b, *ix.shape[1:], c)


def _use_mm_kernel(h: int, w: int, c: int) -> bool:
    """Route to the one-hot-matmul Pallas kernels (kernels/warp_matmul.py)
    on TPU when the whole image fits a VMEM block.  XLA's TPU gather runs
    at ~7 ns/index and its scatter is worse (see the performance note
    below); the matmul formulation moves both onto the MXU.
    ENDODAV_NO_WARP_MM=1 forces the XLA gather/scatter paths."""
    if env_on("ENDODAV_NO_WARP_MM"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return c <= 4 and h >= 8 and w >= 8 and h * w * c * 4 <= 4 * 1024 * 1024


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "border",
    align_corners: bool = True,
    img_grad: bool = True,
    img_tile: int = 1,
) -> jnp.ndarray:
    """Bilinear sampling with torch `grid_sample` semantics.

    img:  [B, H, W, C]; grid: [B*img_tile, Ho, Wo, 2] with normalized
    (x, y) in [-1, 1].

    img_grad=False declares the image gradient-free (input frames): the
    TPU kernel backward then skips the image-grad computation and
    returns ZERO d_img — only set it when that is true.  img_tile > 1
    batches several same-image warps into one kernel launch: grid batch
    element bi samples img[bi // img_tile] (requires img_grad=False).
    Both are performance hints; results are identical.

    Integer images are supported: gathered corners are converted to f32
    *after* the gather and the blend returned in f32 (bilinear blending
    commutes with the linear u8->f32 conversion, so `grid_sample(u8)/255`
    equals `grid_sample(u8/255)` to f32 rounding).

    Performance note (measured, tools/bench_gather.py + PERFORMANCE.md
    "Train-step profile"): XLA's TPU gather costs ~7 ns per INDEX
    regardless of dtype or slice width (u8/bf16/f32 identical; 2x2-patch
    and x-pair multi-dim slices are *slower* per corner), so these warps
    dominate the reference-config train step and no XLA-level
    reformulation helps.  Mosaic's in-kernel `dynamic_gather` is limited
    to a single source vreg ("Multiple source vregs along gather
    dimension: Not implemented"), which rules out a fast Pallas gather
    until that lands upstream.
    """
    integer_img = jnp.issubdtype(img.dtype, jnp.integer)
    b, h, w, c = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    if _use_mm_kernel(h, w, c):
        from endodav_tpu.kernels.warp_matmul import grid_sample_mm

        src = img.astype(jnp.float32) if integer_img else img
        out = grid_sample_mm(src, fx, fy, padding_mode == "zeros",
                             align_corners, img_grad, img_tile)
        return out if integer_img else out.astype(img.dtype)

    if img_tile != 1:  # XLA fallback: materialize the shared images
        img = jnp.repeat(img, img_tile, axis=0)
        if not img_grad:
            img = jax.lax.stop_gradient(img)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    xs = (x0.astype(jnp.int32), x0.astype(jnp.int32) + 1)
    ys = (y0.astype(jnp.int32), y0.astype(jnp.int32) + 1)
    out = 0.0
    for i, yi in enumerate(ys):
        for j, xi in enumerate(xs):
            weight = (wy if i else 1.0 - wy) * (wx if j else 1.0 - wx)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            val = _gather_hw(img, xc, yc)
            if integer_img:
                val = val.astype(jnp.float32)
            if padding_mode == "zeros":
                inside = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
                weight = weight * inside[..., None]
            out = out + weight * val
    return out.astype(jnp.float32) if integer_img else out.astype(img.dtype)


def flow_to_grid(flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel-displacement field [B, H, W, 2] (dy, dx) -> normalized
    `grid_sample` grid (x, y), align_corners=True convention — the grid
    construction half of `flow_warp`, exposed so callers can batch
    several flow warps into one `grid_sample` launch."""
    _, h, w, _ = flow.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij")
    ny = yy[None] + flow[..., 0]
    nx = xx[None] + flow[..., 1]
    gx = 2.0 * (nx / (w - 1) - 0.5)
    gy = 2.0 * (ny / (h - 1) - 0.5)
    return jnp.stack([gx, gy], axis=-1)


def flow_warp(src: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "border",
              img_grad: bool = True, img_tile: int = 1) -> jnp.ndarray:
    """Warp ``src`` by a pixel-displacement field (SpatialTransformer parity).

    src: [B, H, W, C]; flow: [B*img_tile, H, W, 2] with channels (dy, dx)
    — the reference stacks its sampling grid as (y, x)
    (utils/layers.py:398-401).  img_grad / img_tile as in `grid_sample`.
    """
    return grid_sample(src, flow_to_grid(flow), padding_mode=padding_mode,
                       img_grad=img_grad, img_tile=img_tile)


def forward_splat_occupancy(coords_xy: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear forward-splat of unit mass at unnormalized target coords.

    coords_xy: [B, H, W, 2] with (x, y) pixel coordinates.  Returns the
    occupancy map [B, H, W, 1] — how much source mass lands on each target
    pixel.  Mirrors `get_corresponding_map` (utils/layers.py:552-605)
    including its exact corner-weight and out-of-range conventions.

    On TPU the forward routes to the accumulating one-hot-matmul kernel
    (kernels/warp_matmul.py:splat_mm — XLA's scatter-add is the slowest
    op class on TPU); the backward, if ever needed, recomputes through
    this XLA formulation's autodiff.
    """
    if _use_mm_kernel(height, width, 1):
        return _splat_fast(coords_xy, height, width)
    return _splat_xla(coords_xy, height, width)


def _splat_xla(coords_xy: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    b = coords_xy.shape[0]
    x = coords_xy[..., 0].reshape(b, -1)
    y = coords_xy[..., 1].reshape(b, -1)

    x1 = jnp.floor(x)
    y1 = jnp.floor(y)
    x0 = x1 + 1
    y0 = y1 + 1

    x_floor = jnp.clip(x1, 0, width - 1)
    y_floor = jnp.clip(y1, 0, height - 1)
    x_ceil = jnp.clip(x0, 0, width - 1)
    y_ceil = jnp.clip(y0, 0, height - 1)

    invalid_xc = x0 != x_ceil
    invalid_yc = y0 != y_ceil
    invalid_xf = x1 != x_floor
    invalid_yf = y1 != y_floor

    corners = [
        (x_ceil, y_ceil, invalid_xc | invalid_yc),
        (x_ceil, y_floor, invalid_xc | invalid_yf),
        (x_floor, y_ceil, invalid_xf | invalid_yc),
        (x_floor, y_floor, invalid_xf | invalid_yf),
    ]
    out = jnp.zeros((b, height * width), dtype=coords_xy.dtype)
    batch_idx = jnp.arange(b)[:, None]
    for cx, cy, invalid in corners:
        val = (1.0 - jnp.abs(x - cx)) * (1.0 - jnp.abs(y - cy))
        val = jnp.where(invalid, 0.0, val)
        idx = (cy * width + cx).astype(jnp.int32)
        out = out.at[batch_idx, idx].add(val)
    return out.reshape(b, height, width, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _splat_fast(coords_xy, height, width):
    from endodav_tpu.kernels.warp_matmul import splat_mm

    b = coords_xy.shape[0]
    x = coords_xy[..., 0].reshape(b, -1)
    y = coords_xy[..., 1].reshape(b, -1)
    occ = splat_mm(x, y, height, width)
    return occ.reshape(b, height, width, 1).astype(coords_xy.dtype)


def _splat_fast_fwd(coords_xy, height, width):
    return _splat_fast(coords_xy, height, width), coords_xy


def _splat_fast_bwd(height, width, coords_xy, g):
    _, vjp = jax.vjp(lambda c: _splat_xla(c, height, width), coords_xy)
    return vjp(g)


_splat_fast.defvjp(_splat_fast_fwd, _splat_fast_bwd)


def occlusion_mask_backward(flow_reverse: jnp.ndarray, th: float = 0.95):
    """Occupancy-based backward occlusion mask (utils/layers.py:458-479).

    flow_reverse: [B, H, W, 2] (dy, dx).  Returns (mask, map), both
    [B, H, W, 1]; mask = (occupancy > th).
    """
    b, h, w, _ = flow_reverse.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=flow_reverse.dtype),
        jnp.arange(w, dtype=flow_reverse.dtype),
        indexing="ij",
    )
    tx = xx[None] + flow_reverse[..., 1]
    ty = yy[None] + flow_reverse[..., 0]
    occu_map = forward_splat_occupancy(jnp.stack([tx, ty], axis=-1), h, w)
    return (occu_map > th).astype(flow_reverse.dtype), occu_map


def flow_consistency(flow12: jnp.ndarray, flow21: jnp.ndarray) -> jnp.ndarray:
    """|flow12 + warp(flow21, flow12)| (utils/layers.py:482-519).

    Both flows are [B, H, W, 2] (dy, dx).  Note the reference warps with
    align_corners left at the torch default (False) here.
    """
    b, h, w, _ = flow12.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=flow12.dtype), jnp.arange(w, dtype=flow12.dtype), indexing="ij")
    ny = yy[None] + flow12[..., 0]
    nx = xx[None] + flow12[..., 1]
    gx = 2.0 * (nx / (w - 1) - 0.5)
    gy = 2.0 * (ny / (h - 1) - 0.5)
    warped = grid_sample(flow21, jnp.stack([gx, gy], axis=-1), padding_mode="border", align_corners=False)
    return jnp.abs(flow12 + warped)
