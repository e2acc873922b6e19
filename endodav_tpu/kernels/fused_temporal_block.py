"""Fused temporal attention block — round-2 Pallas attempt.

Round 1's `temporal_attention` kernel lost to XLA 8.6x at the production
shape (PERFORMANCE.md "Kernels"): its per-cell (R,T,H,dh)->(R·H,T,dh)
fold forced Mosaic relayouts, and an attention-only kernel has too
little arithmetic to hide them at T=32 with tiny head dims.

This file takes the opposite route: fuse the ENTIRE pre-FFN attention
sub-block of the motion module (models/motion.py TemporalTransformerBlock
:132-138) into one kernel —

    out = x + (Attn(LN(x) + pe) @ Wo + bo)

so the C x C projection GEMMs (the only MXU-friendly math in the block)
ride in the same VMEM residency as the T=32 attention chain, and the
[B*, T, C] activations make ONE HBM round trip instead of XLA's
~8 materializations (LN out, q, k, v, scores, probs, attn out, proj
out).  The per-head split is an in-kernel lane slice + unrolled head
loop — no transposed fold.

Backward recomputes through the XLA reference path via custom_vjp
(T=32 makes recompute cheap, same strategy as kernels/flash_attention).

models/motion.py routes the APE attention sub-block here on TPU for
C<=384 at inference (measured +13%/+11% whole-model at 518px/224x280,
PERFORMANCE.md "Kernels"); `reference_block` below is the exact XLA
oracle used for both correctness tests and benchmarking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_temporal_block", "reference_block", "default_rows"]


def default_rows(c: int, bstar: int | None = None) -> int:
    """Rows-per-grid-cell, from the chained-timing v5e sweep
    (tools/bench_temporal_kernel.py): C=192 -> 16 (82 us vs ~1000 us at
    r32/r64 — larger blocks spill), C=384 -> 16/32 within noise (r64
    exceeds VMEM), C=64 -> r32/r64 within noise.  C>=512 routes to the
    head-grouped kernel: r16 wins at large row counts (vitl518 layer_3
    1702 rows: 3.06 vs 3.86 ms), r8 below (layer_4 437 rows: 0.64 vs
    1.71 ms) — the round-3 vitl sweep."""
    if c >= 512:
        return 16 if (bstar or 0) >= 1024 else 8
    return 16 if c >= 128 else 32


def reference_block(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads: int):
    """XLA oracle: x + Attn(LN(x)+pe) Wo + bo, per-head softmax(QK^T/sqrt(dh))V."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    y = (y + pe).astype(x.dtype)
    q, k, v = y @ wq, y @ wk, y @ wv
    b, t, c = x.shape
    dh = c // heads
    q = q.reshape(b, t, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * dh ** -0.5, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, t, c).astype(x.dtype)
    return x + (o @ wo + bo).astype(x.dtype)


def _kernel(x_ref, gamma_ref, beta_ref, pe_ref, wq_ref, wk_ref, wv_ref,
            wo_ref, bo_ref, o_ref, *, heads: int):
    r, t, c = x_ref.shape
    dh = c // heads
    scale = dh ** -0.5

    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma_ref[:] + beta_ref[:]
    y = y + pe_ref[:]  # [T, C] broadcasts over rows

    y2 = y.reshape(r * t, c).astype(x_ref.dtype)
    q = jnp.dot(y2, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(y2, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(y2, wv_ref[:], preferred_element_type=jnp.float32)
    q = q.reshape(r, t, c)
    k = k.reshape(r, t, c)
    v = v.reshape(r, t, c)

    # per-head attention: lane slices, batched dot over the row axis,
    # heads unrolled (H is 8) — no transposed (R,H) fold.
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [R, T, T]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # [R, T, dh]
    att = jnp.concatenate(outs, axis=-1).reshape(r * t, c)

    out = jnp.dot(att.astype(x_ref.dtype), wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:]
    o_ref[:] = (x + out.reshape(r, t, c)).astype(o_ref.dtype)


def _grouped_kernel(x_ref, gamma_ref, beta_ref, pe_ref, wq_ref, wk_ref,
                    wv_ref, wo_ref, bo_ref, o_ref, y_s, acc_s, *,
                    heads_g: int, groups: int):
    """Head-grouped variant for wide channels (vitl C=1024): the four
    C x C weight panels alone would blow VMEM, so the grid gains an
    inner 'arbitrary' axis over head groups whose BlockSpecs slice
    wq/wk/wv to [C, C/G] and wo to [C/G, C].  LN(x)+pe is computed once
    (group 0) into a VMEM scratch; the out-projection partial sums
    accumulate in an f32 scratch and flush (+x +bo) at the last group —
    so precision matches the ungrouped kernel's single f32 GEMM."""
    r, t, c = x_ref.shape
    cg = wq_ref.shape[1]
    dh = cg // heads_g
    scale = dh ** -0.5
    g_idx = pl.program_id(1)

    @pl.when(g_idx == 0)
    def _ln():
        x = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma_ref[:] + beta_ref[:]
        y_s[:] = (y + pe_ref[:]).astype(y_s.dtype)

    y2 = y_s[:].reshape(r * t, c)
    q = jnp.dot(y2, wq_ref[:], preferred_element_type=jnp.float32).reshape(r, t, cg)
    k = jnp.dot(y2, wk_ref[:], preferred_element_type=jnp.float32).reshape(r, t, cg)
    v = jnp.dot(y2, wv_ref[:], preferred_element_type=jnp.float32).reshape(r, t, cg)

    outs = []
    for h in range(heads_g):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [R, T, T]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    att = jnp.concatenate(outs, axis=-1).reshape(r * t, cg)
    upd = jnp.dot(att.astype(x_ref.dtype), wo_ref[:],
                  preferred_element_type=jnp.float32).reshape(r, t, c)

    @pl.when(g_idx == 0)
    def _init():
        acc_s[:] = upd

    @pl.when(g_idx != 0)
    def _acc():
        acc_s[:] += upd

    @pl.when(g_idx == groups - 1)
    def _flush():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_s[:] + bo_ref[:]
                    ).astype(o_ref.dtype)


def _forward(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, rows):
    bstar, t, c = x.shape
    pad = (-bstar) % rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    n_blocks = (bstar + pad) // rows

    xspec = pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((bstar + pad, t, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n_blocks,),
            in_specs=[xspec, vec((c,)), vec((c,)), vec((t, c)), vec((c, c)),
                      vec((c, c)), vec((c, c)), vec((c, c)), vec((c,))],
            out_specs=xspec,
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x, gamma, beta, pe, wq, wk, wv, wo, bo)
    return out[:bstar]


def _forward_grouped(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, rows):
    """Wide-channel path: grid (row blocks, head groups), weight panels
    sliced per group so each grid step's VMEM stays bounded."""
    bstar, t, c = x.shape
    groups = max(1, c // 256)
    while heads % groups:
        groups //= 2
    heads_g = heads // groups
    cg = c // groups
    pad = (-bstar) % rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    n_blocks = (bstar + pad) // rows

    xspec = pl.BlockSpec((rows, t, c), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda shape: pl.BlockSpec(shape, lambda i, g: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((c, cg), lambda i, g: (0, g), memory_space=pltpu.VMEM)
    wo_spec = pl.BlockSpec((cg, c), lambda i, g: (g, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_grouped_kernel, heads_g=heads_g, groups=groups),
        out_shape=jax.ShapeDtypeStruct((bstar + pad, t, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n_blocks, groups),
            in_specs=[xspec, vec((c,)), vec((c,)), vec((t, c)), qkv_spec,
                      qkv_spec, qkv_spec, wo_spec, vec((c,))],
            out_specs=xspec,
            scratch_shapes=[
                pltpu.VMEM((rows, t, c), x.dtype),
                pltpu.VMEM((rows, t, c), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, gamma, beta, pe, wq, wk, wv, wo, bo)
    return out[:bstar]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_temporal_block(x, gamma, beta, pe, wq, wk, wv, wo, bo,
                         heads: int = 8, rows: int = 32):
    """x: [B*, T, C]; LN params gamma/beta [C]; pe [T, C]; projections
    wq/wk/wv/wo [C, C]; bo [C].  Returns x + Attn(LN(x)+pe) Wo + bo.
    C >= 512 routes to the head-grouped kernel (vitl widths)."""
    fwd = _forward_grouped if x.shape[-1] >= 512 else _forward
    return fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, rows)


def _fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, rows):
    fwd = _forward_grouped if x.shape[-1] >= 512 else _forward
    out = fwd(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads, rows)
    return out, (x, gamma, beta, pe, wq, wk, wv, wo, bo)


def _bwd(heads, rows, res, g):
    x, gamma, beta, pe, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: reference_block(*a, heads=heads), x, gamma, beta, pe,
        wq, wk, wv, wo, bo,
    )
    return vjp(g)


fused_temporal_block.defvjp(_fwd, _bwd)
