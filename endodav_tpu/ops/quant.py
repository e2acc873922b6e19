"""Dynamic int8 GEMM path for the serving-time ViT projections.

TPU v5e's MXU rates int8 at 394 TOPS vs 197 TFLOP/s bf16, and the
serving profile's compute core is the ViT GEMMs (~45% in-kernel MFU,
PERFORMANCE.md "MFU context") — so int8 quantization of exactly those
GEMMs is the one remaining large serving lever after the round-2/3
kernel work.  This module implements it as a *dynamic* scheme with no
checkpoint machinery:

  * activations: symmetric per-row scales computed on the fly
    (`amax/127` over the contraction axis),
  * weights: symmetric per-output-channel scales, quantized at trace
    time from the live f32/bf16 kernel (XLA constant-folds the weight
    quantization against the frozen serving params, so it costs nothing
    per step; even unfused it is O(C_in*C_out) elementwise next to an
    O(rows*C_in*C_out) GEMM),
  * accumulation in int32 on the MXU (`preferred_element_type`),
  * f32 rescale epilogue `acc * x_scale * w_scale (+ bias)`.

Scope: opt-in via the model config (``EndoDAV(int8_serving=True)``,
threaded by the engine; ``ENDODAV_INT8`` env var as explicit override
only — see `resolve_int8`) and applied ONLY to the token-space
ViT projections (block MLP fc1/fc2, fused-qkv, attention out-proj) —
the layers whose GEMMs are large enough to ride the int8 MXU rate.  The
attention score/value matmuls, temporal modules, DPT convs and every
training path stay bf16/f32: their arithmetic is small-dim or
VPU-bound, where int8 buys nothing (measured for bf16 softmax in
PERFORMANCE.md "closed experiments").

SERVING ONLY: `round()` has zero gradient, so a train step with
``ENDODAV_INT8`` set would silently stop updating the quantized layers.
Every training entry point leaves the flag unset; the engine reads it
at serving-graph trace time.

Accuracy: symmetric per-row/per-channel dynamic quantization is the
standard highest-accuracy cheap scheme, but it is still a lossy rewrite
of the model — released-weight AbsRel under int8 must be measured before
production use (blocked here with the truncated reference checkpoint,
DESIGN.md "Known gaps").  `tools/bench_int8.py` measures the raw MXU
ceiling; `tests/test_quant.py` bounds the whole-model disparity
deviation on random weights.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from endodav_tpu.utils.envflags import env_on  # canonical home; re-exported

__all__ = ["env_on", "int8_enabled", "resolve_int8", "int8_dense",
           "quantize_weight"]


def resolve_int8(flag: bool | None = None) -> bool:
    """Whether the current trace serves int8 GEMMs.

    ``flag`` is the decision threaded through the model config
    (``EndoDAV(int8_serving=...)`` -> ``DinoViT(quant_int8=...)`` -> the
    attention/MLP modules) — the engine sets it per MODEL, so a vitl
    auto-default can never leak into another engine built later in the
    same process.  An EXPLICITLY SET ``ENDODAV_INT8`` env var overrides
    it either way (the A/B switch: ``=1`` forces on, ``=0`` forces off);
    no library code writes the env var.
    """
    if "ENDODAV_INT8" in os.environ:
        return env_on("ENDODAV_INT8")
    return bool(flag)


def int8_enabled() -> bool:
    """Env-only view of the int8 switch (no model-threaded flag in
    scope).  Training processes are guarded upstream: the Trainer strips
    the flag from the environment at init (round() has zero gradient —
    see module docstring).
    """
    return resolve_int8(None)


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of a [in, out]
    kernel; returns (w8 int8 [in, out], scale f32 [out])."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w8, scale


def _quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization over the last axis of x
    (any leading shape); returns (x8 int8, scale f32 [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def int8_dense(x: jnp.ndarray, w: jnp.ndarray, bias=None,
               out_dtype=None, x_quant=None) -> jnp.ndarray:
    """y = x @ w (+ bias) with the contraction on the int8 MXU.

    x: [..., in] activations (f32/bf16), w: [in, out] kernel (f32/bf16).
    Quantization is dynamic on both sides (docstring above); the rescale
    epilogue and bias-add run in f32, the result is cast to ``out_dtype``
    (default: x.dtype).

    ``x_quant``: optional precomputed ``(x8, x_scale)`` pair (from
    `_quantize_rows`) so a caller projecting several weight panels from
    one activation — the fused-qkv path — shares a single activation
    quantization while keeping this one epilogue implementation.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    w8, w_scale = quantize_weight(w)
    x8, x_scale = x_quant if x_quant is not None else _quantize_rows(x)
    ndim = x8.ndim
    acc = jax.lax.dot_general(
        x8, w8, (((ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
