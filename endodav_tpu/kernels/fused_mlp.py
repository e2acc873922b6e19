"""Fused transformer-MLP Pallas kernel: x @ W1 + b1 -> gelu -> @ W2 + b2.

Round-5 serving profile (tools/profile_dedup_head.py): the dedup
encode is the larger half of the 518px clip and its MLP GEMMs run at
~33% MFU — bandwidth-bound, not MXU-bound.  XLA materializes the
[rows, 4C] hidden activations to HBM between fc1(+gelu) and fc2
(~1 GB per ViT-S layer at fb=32), so each layer pays ~3x the traffic
of its inputs/outputs.  This kernel keeps the hidden tile resident in
VMEM: per 512-row tile it reads x once, runs both GEMMs and the exact
(erf) gelu in f32, and writes only the output — the canonical fused-MLP
pattern, with full MXU tiles at every production shape
(K=C in {384, 1024}, N=4C, M tiled at 512; nothing pads).

Unlike the conv-fusion candidates this round measured and rejected
(FFB resize->out_conv: F=64 pads every dot 2-4x; banded resize: breadth
beats the saved FLOPs — PERFORMANCE.md round 5), the MLP is pure
large-GEMM, which is the one shape Pallas reliably matches XLA on.

SERVING ONLY: gradients would need either saved hiddens (defeating the
fusion) or recompute (an extra forward vs XLA autodiff); the trunk
graph carries no train flag, so routing is by an explicit model-config
flag the engine sets on serving graphs (models/vit.py:Mlp.fused_mlp,
mirroring the int8_serving plumbing).  ENDODAV_FUSED_MLP=0/1 is the
explicit override.  Numerics: both GEMMs accumulate f32 on the bf16
MXU with a bf16 hidden between them — the same dtype chain as the XLA
path (dense bf16 matmul + f32-exact gelu application); whole-model
disparity deviation is bounded by tests/test_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mlp", "mlp_reference"]

_ROWS = 512  # M tile; VMEM ~ (512*(C + 4C + C)) * 2-4 B well under budget


def mlp_reference(x, w1, b1, w2, b2):
    """The exact XLA composition the kernel replaces (dtype-faithful:
    bf16 operands, f32-exact gelu on the f32-accumulated fc1 output)."""
    h = jax.lax.dot_general(x, w1, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = jax.lax.dot_general(h, w2, (((h.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(x.dtype)


def _gelu_exact(h):
    """x/2 * (1 + erf(x/sqrt(2))) with erf evaluated by the
    Abramowitz-Stegun 7.1.26 rational approximation (|error| <= 1.5e-7
    absolute): Mosaic has no TPU lowering for erf/erfc, and 1.5e-7 on
    erf bounds the gelu error below bf16 resolution (2^-8 relative) —
    the hidden activations are rounded to bf16 right after, so the
    approximation is invisible in the output (interpret-mode parity vs
    jax.nn.gelu(approximate=False) passes at 2e-5 f32)."""
    x = h * (2.0 ** -0.5)
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * h * (1.0 + erf)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = _gelu_exact(h).astype(x_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_mlp(x, w1, b1, w2, b2):
    """x [..., C] @ w1 [C, H] + b1 -> exact gelu -> @ w2 [H, C2] + b2.

    Rows are flattened and tiled at _ROWS; the weight blocks are
    constant over the row grid, so Mosaic keeps them VMEM-resident and
    the hidden activations never touch HBM."""
    *lead, c = x.shape
    rows = 1
    for s in lead:
        rows *= s
    xf = x.reshape(rows, c)
    pad = (-rows) % _ROWS
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rp = rows + pad
    h_dim, c2 = w1.shape[1], w2.shape[1]
    dt = x.dtype
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rp, c2), dt),
        grid=(rp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0)),
            pl.BlockSpec((h_dim, c2), lambda i: (0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, c2), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xf.astype(dt), w1.astype(dt), b1.reshape(1, -1), w2.astype(dt),
      b2.reshape(1, -1))
    if pad:
        out = out[:rows]
    return out.reshape(*lead, c2)
