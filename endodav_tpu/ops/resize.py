"""Separable image resize as dense interpolation matmuls (MXU-friendly).

Every resize in the framework — decoder upsampling, disparity pyramid,
pos-embed interpolation, eval preprocessing — is expressed as two dense
matrix multiplies ``out = M_h @ x @ M_w^T`` with interpolation matrices
precomputed from *static* shapes at trace time.  On TPU this maps straight
onto the MXU and fuses with neighbouring ops, instead of the gather-based
lowering XLA would emit for a generic `jax.image.resize`.

The weight formulas reproduce the exact coordinate semantics the reference
pipeline relies on (reference: models/endodav/endodav.py:153 bilinear
align_corners=True; models/backbones/vision_transformer.py:204 bicubic with
explicit scale factors; models/endodav/util/transform.py:113 cv2
INTER_CUBIC; datasets/scared_video_dataset.py:188 antialiased bilinear):

* torch ``align_corners=True``  : src = dst * (in-1)/(out-1)
* torch ``align_corners=False`` : src = (dst+0.5)/scale - 0.5 (scale=out/in
  unless an explicit scale factor is given), border-clamped
* bicubic: Keys kernel with a = -0.75 (torch and OpenCV both use -0.75)
* antialiased bilinear: triangle filter stretched by the downscale factor
  (torchvision `antialias=True` semantics)
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

__all__ = ["interp_matrix", "resize2d", "resize_nchw"]


def _banded_col_pass(y, m_np, mdtype, acc):
    """Windowed column pass (ENDODAV_BANDED_RESIZE=1 experiment):
    out[..., q, c] = sum_w m[q, w] y[..., w, c], emitted as 128-wide
    q-chunks each contracting only the input window its rows touch.
    Bilinear/bicubic interp matrices are 2-/4-banded, so the dense
    einsum burns ~W/window more MXU FLOPs than needed (~2-3x at the DPT
    up-resizes); the trade is graph breadth (one dot + slice per chunk
    and a lane concat — the round-4 fast-reflect lesson says breadth
    can cost more than it saves, hence experiment-gated)."""
    Q, W = m_np.shape
    chunks = []
    for q0 in range(0, Q, 128):
        sub = m_np[q0:min(q0 + 128, Q)]
        nz = np.nonzero(sub.any(axis=0))[0]
        w0, w1 = int(nz[0]), int(nz[-1]) + 1
        mj = jnp.asarray(sub[:, w0:w1], dtype=mdtype)
        chunks.append(jnp.einsum("bpwc,qw->bpqc", y[:, :, w0:w1, :], mj,
                                 preferred_element_type=acc))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=2)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys bicubic kernel with parameter ``a`` (torch/cv2 use a=-0.75)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


@functools.lru_cache(maxsize=None)
def interp_matrix(
    in_size: int,
    out_size: int,
    method: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    scale: float | None = None,
) -> np.ndarray:
    """Dense (out_size, in_size) float32 interpolation matrix.

    ``scale``, when given, overrides out/in for the coordinate mapping —
    this reproduces `F.interpolate(..., scale_factor=s)` semantics used for
    ViT pos-embed interpolation (vision_transformer.py:204-209).
    """
    if in_size == out_size and not antialias:
        return np.eye(out_size, dtype=np.float32)

    dst = np.arange(out_size, dtype=np.float64)
    eff_scale = scale if scale is not None else out_size / in_size

    if method == "nearest":
        src = np.floor(dst * (in_size / out_size)).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        m = np.zeros((out_size, in_size), dtype=np.float32)
        m[np.arange(out_size), src] = 1.0
        return m

    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) / eff_scale - 0.5

    if method == "bilinear":
        kernel, support = _triangle_kernel, 1.0
    elif method == "bicubic":
        kernel, support = _cubic_kernel, 2.0
    else:
        raise ValueError(f"unknown resize method: {method}")

    # Antialias: stretch the kernel by the downscale factor.
    if antialias and eff_scale < 1.0:
        kwidth = support / eff_scale
        kscale = eff_scale
    else:
        kwidth = support
        kscale = 1.0

    lo = np.floor(src - kwidth).astype(np.int64)
    hi = np.ceil(src + kwidth).astype(np.int64)
    max_taps = int((hi - lo).max()) + 1

    taps = lo[:, None] + np.arange(max_taps)[None, :]  # (out, taps)
    w = kernel((taps - src[:, None]) * kscale)
    if antialias and eff_scale < 1.0:
        # torchvision antialias drops out-of-range taps and renormalizes
        # over the in-range ones (no border replication).
        w = np.where((taps < 0) | (taps > in_size - 1), 0.0, w)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)

    # Border clamp (replicate edge pixels) — matches torch/cv2 behaviour
    # for the non-antialiased modes.
    taps = np.clip(taps, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(m, (np.repeat(np.arange(out_size), max_taps), taps.ravel()), w.ravel())
    return m.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    size: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    scale_hw: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize the (H, W) dims of a channels-last image ``(..., H, W, C)``."""
    *lead, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w) and not antialias:
        return x
    sh, sw = (scale_hw if scale_hw is not None else (None, None))
    # Half-precision inputs get half-precision interp matrices: a f32
    # operand forces the MXU into its multi-pass f32 emulation and a
    # convert_element_type pass on the output (profiled: resize einsums
    # were 37 ms of the 266 ms 518px serving chunk with f32 matrices).
    # bf16 carries the dyadic bilinear weights (.5/.25...) exactly; the
    # accumulator stays f32 inside the MXU either way.  f32 inputs (all
    # parity/golden tests, metric resizes) keep full f32 matrices.
    half = x.dtype in (jnp.bfloat16, jnp.float16)
    mdtype = x.dtype if half else jnp.float32
    acc = x.dtype if half else jnp.float32
    mh = jnp.asarray(interp_matrix(h, oh, method, align_corners, antialias, sh),
                     dtype=mdtype)
    mw = jnp.asarray(interp_matrix(w, ow, method, align_corners, antialias, sw),
                     dtype=mdtype)
    # separable passes as einsums over the native layout — XLA folds the
    # dimension ordering into the dot_generals instead of materializing
    # the reshape/swapaxes relayouts (profiled at 28+ ms per big resize
    # in the manual-transpose form, PERFORMANCE.md serving profile).
    # The image rides the LHS of both einsums; jnp.einsum emits the same
    # dot_generals either way, and operand order measured NEUTRAL at
    # steady state (tools/bench_resize_c1.py — NOTE that tool's warm-up
    # caveat: the FIRST timed loop of any fresh executable in this
    # environment reads ~3-4x inflated, which initially masqueraded as a
    # 4x operand-order win).
    if c == 1:
        # single-channel maps (disparity outputs): squeezed 3D form —
        # drops a useless trailing unit dim from both contractions
        y = x.reshape((-1, h, w))
        y = jnp.einsum("bhw,ph->bpw", y, mh, preferred_element_type=acc)
        y = jnp.einsum("bpw,qw->bpq", y, mw, preferred_element_type=acc)
        return y.reshape((*lead, oh, ow, 1)).astype(x.dtype)
    y = x.reshape((-1, h, w, c))
    y = jnp.einsum("bhwc,ph->bpwc", y, mh, preferred_element_type=acc)
    if (os.environ.get("ENDODAV_BANDED_RESIZE") == "1"
            and method == "bilinear" and not antialias and ow >= 256):
        y = _banded_col_pass(
            y, interp_matrix(w, ow, method, align_corners, antialias, sw),
            mdtype, acc)
    else:
        y = jnp.einsum("bpwc,qw->bpqc", y, mw, preferred_element_type=acc)
    return y.reshape((*lead, oh, ow, c)).astype(x.dtype)


def resize_nchw(x, size, **kw):
    """Convenience wrapper for rare channel-first call sites."""
    return jnp.moveaxis(resize2d(jnp.moveaxis(x, -3, -1), size, **kw), -1, -3)
