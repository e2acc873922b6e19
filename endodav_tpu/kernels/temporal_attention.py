"""Pallas TPU kernel for temporal ("motion module") attention.

The second native-kernel surface of the reference (SURVEY.md §2.6 item 1):
xformers attention over the `[B·H·W, T=32, C]` layout of the temporal
transformer (motion_module/attention.py:256-293).  The shape regime is
the inverse of LLM attention — sequence length is a constant 32 while the
batch axis is enormous (windows × spatial positions) and head dims are
tiny (C/8 = 8..128).

The kernel therefore tiles the *batch* axis onto the grid: each cell
holds a block of R batch rows with all heads, computes the batched
QK^T -> masked-free softmax -> PV chain entirely in VMEM (batched
`dot_general` over the (row, head) axes), and writes the block back —
one HBM round-trip for the whole attention instead of XLA's
scores-to-HBM schedule.  Backward recomputes in XLA via custom_vjp
(T=32 makes recompute trivially cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["temporal_attention"]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    r, t, h, dh = q_ref.shape

    def fold(ref):  # [R, T, H, dh] -> [R*H, T, dh] (Mosaic: max 1 batch dim)
        return jnp.transpose(ref[:], (0, 2, 1, 3)).reshape(r * h, t, dh)

    q = fold(q_ref)
    k = fold(k_ref)
    v = fold(v_ref)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [R*H, T, T]
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [R*H, T, dh]
    o = jnp.transpose(o.reshape(r, h, t, dh), (0, 2, 1, 3))
    o_ref[:] = o.astype(o_ref.dtype)


def _forward(q, k, v, scale):
    bstar, t, h, dh = q.shape
    rows = 8
    pad = (-bstar) % rows
    if pad:
        padding = ((0, pad), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
    grid = ((bstar + pad) // rows,)
    spec = pl.BlockSpec((rows, t, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bstar + pad, t, h, dh), q.dtype),
        grid_spec=pl.GridSpec(grid=grid, in_specs=[spec, spec, spec], out_specs=spec),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(q, k, v)
    return out[:bstar]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def temporal_attention(q, k, v, scale: float | None = None):
    """Attention over [B*, T, H, Dh] with T small (<= ~64)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    sc = q.shape[-1] ** -0.5 if scale is None else scale
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * sc
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k, preferred_element_type=jnp.float32) * sc
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q, preferred_element_type=jnp.float32) * sc
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


temporal_attention.defvjp(_fwd, _bwd)
