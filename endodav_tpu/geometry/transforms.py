"""Differentiable camera geometry (pure jnp, shape-polymorphic, vmap-safe).

Functional counterparts of the reference's geometry modules
(utils/layers.py: disp_to_depth:11, rot_from_axisangle:59,
transformation_from_parameters:23, BackprojectDepth:134, Project3D:166,
optical_flow:429).  The torch versions were stateful nn.Modules holding
pixel grids as buffers; here everything is a pure function of static
shapes — the grids constant-fold under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 4x4 pose/intrinsics algebra is negligible FLOPs — run it at full f32
# precision so pose chains stay orthonormal on TPU (default matmul is bf16).
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "disp_to_depth",
    "rot_from_axisangle",
    "translation_matrix",
    "transformation_from_parameters",
    "pixel_grid_homogeneous",
    "backproject_depth",
    "project_3d",
    "rigid_flow",
]


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth) in [min_depth, max_depth]."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation as a 4x4 homogeneous matrix [..., 4, 4]."""
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c1 = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xc, yc, zc = x * c1, y * c1, z * c1
    xyc, yzc, zxc = x * yc, y * zc, z * xc

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xc + ca, xyc - zs, zxc + ys, zeros,
            xyc + zs, y * yc + ca, yzc - xs, zeros,
            zxc - ys, yzc + xs, z * zc + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    )
    return rot.reshape(*vec.shape[:-1], 4, 4)


def translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation [..., 3] -> 4x4 homogeneous matrix."""
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (*t.shape[:-1], 4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axis-angle [...,3], translation [...,3]) -> SE(3) [..., 4, 4].

    Matches utils/layers.py:23-40 including the invert composition order.
    """
    rot = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        rot = jnp.swapaxes(rot, -1, -2)
        t = -t
    trans = translation_matrix(t)
    compose = (rot, trans) if invert else (trans, rot)
    return jnp.matmul(compose[0], compose[1], precision=_HI)


def pixel_grid_homogeneous(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """[3, H*W] homogeneous pixel coordinates (x, y, 1), row-major."""
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    ones = jnp.ones_like(xx)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1), ones.reshape(-1)], axis=0)


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth [B, H, W(, 1)] + inv_K [B, 4, 4] -> homogeneous cam points [B, 4, H*W]."""
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    pix = pixel_grid_homogeneous(h, w, depth.dtype)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision=_HI)
    cam = depth.reshape(b, 1, -1) * cam
    ones = jnp.ones((b, 1, h * w), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Project cam points [B, 4, H*W] through K @ T.

    Returns (grid [B, H, W, 2] normalized (x, y) in [-1, 1] for grid_sample,
    src_depths [B, 1, H*W]) — parity with utils/layers.py:166-189.
    """
    b = points.shape[0]
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)
    z = cam[:, 2:3, :]
    xy = cam[:, :2, :] / (z + eps)
    xy = xy.reshape(b, 2, height, width)
    gx = (xy[:, 0] / (width - 1) - 0.5) * 2.0
    gy = (xy[:, 1] / (height - 1) - 0.5) * 2.0
    return jnp.stack([gx, gy], axis=-1), z


def rigid_flow(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Rigid (dy, dx) flow induced by depth+pose (utils/layers.py:429-455).

    Returns [B, H, W, 2] with channels (dy, dx) to match the reference's
    flow convention.
    """
    b = points.shape[0]
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)
    xy = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    xy = xy.reshape(b, 2, height, width)
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=points.dtype), jnp.arange(width, dtype=points.dtype), indexing="ij"
    )
    dy = xy[:, 1] - yy[None]
    dx = xy[:, 0] - xx[None]
    return jnp.stack([dy, dx], axis=-1)
