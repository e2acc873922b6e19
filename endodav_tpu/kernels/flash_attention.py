"""Pallas TPU attention kernel for the ViT spatial path.

TPU-native replacement for the reference's only native-kernel surface —
xformers `memory_efficient_attention` (models/backbones/layers/
attention.py:72-89, motion_module/attention.py:256-293).

Shape regime (SURVEY.md §2.5): sequences are *short* — N = 321 tokens at
224x280 (+cls), ≤ 1370 at 518px — while the batch axis is huge (windows
× frames × heads).  So unlike LLM flash attention there is no need for
online-softmax KV tiling: a whole (N, Dh) K/V block fits comfortably in
VMEM (1370 x 64 x 4 B ≈ 350 KB).  The kernel therefore:

  * grids over (batch, q-blocks) on the native [B, N, H·Dh] layout —
    heads are peeled by lane slices inside the kernel, so no
    [B,N,H,Dh]->[B,H,N,Dh] transpose is materialized in HBM (the
    relayouts cost more than the kernel at N=1702; PERFORMANCE.md),
  * keeps K/V whole in VMEM per batch cell,
  * computes the f32 scores tile, masked softmax and P@V on the MXU in
    one fused pass (no HBM round-trip for the N×N scores, which is what
    makes the XLA fallback bandwidth-bound).

Sequence padding to the 128-lane grid is handled with key masking (K/V
carry an explicit N-pad; the q-side edge block is Pallas padding whose
rows are clipped on the output write).  The backward pass recomputes
scores in plain XLA (cheap at these N) via custom_vjp, so the kernel is
usable inside the LoRA training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "qkv_flash_attention"]

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                 heads: int, dh: int):
    q = q_ref[0]  # [block_q, H*Dh]
    k = k_ref[0]  # [n_pad, H*Dh]
    v = v_ref[0]
    n_pad = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], n_pad), 1)

    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        # scale folded into q (dh-wide multiply, not N^2).  The softmax
        # normalization stays IMMEDIATE (p / sum before P@V): deferring
        # the divide past the dot looked like a saved N^2 pass but
        # extended p's liveness across the matmul and blew the 16 MB
        # scoped-vmem budget at the production 518px grid (21 MB, B=64)
        # — the compiler reuses s's storage for the in-place divide.  An
        # MXU-denominator variant (mask column contracted on the MXU)
        # fits but measures slower (5.84 vs 4.70 ms; bench_flash_variant).
        qh = (q[:, sl].astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if n_valid != n_pad:
            s = jnp.where(col < n_valid, s, _MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float | None = None,
                    n_valid: int | None = None):
    """Attention over [B, N, H, Dh]; returns [B, n_valid or N, H, Dh].

    ``n_valid``: when the inputs arrive already row-padded to the 128-lane
    grid (the fused-qkv path pads x once and projects at padded length),
    pass the true sequence length here; the kernel masks the pad columns
    and clips the output to ``n_valid`` rows.
    """
    return _forward(q, k, v, scale, n_valid)


def qkv_flash_attention(x, w, bias, heads: int, scale: float | None = None,
                        quant_int8: bool = False):
    """Fused-QKV attention: x [B, N, C] @ w [C, 3C] (+bias) -> attention.

    Pads x ONCE to the 128-row grid and projects q/k/v from weight-column
    slices at padded length, so none of the per-layer qkv[:, :, i] slice
    copies, [B,N,H,Dh] reshape materializations, or separate K/V row pads
    exist (profiled at ~22 ms of the 518px serving chunk).  The pad rows
    of k/v are bias rows, not zeros — harmless: the kernel's score mask
    zeroes their softmax weight exactly, and the q-side pad rows are
    clipped on the output write.  Gradients flow through the projections
    via XLA autodiff and through the kernel via its custom_vjp.
    """
    b, n, _ = x.shape
    # q/k/v width from the WEIGHT, not x: under tensor parallelism the
    # local w is [C, 3*C/g] while x keeps the full C (parallel/tp.py)
    c = w.shape[-1] // 3
    dh = c // heads
    n_pad = _round_up(n, 128)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    if quant_int8:
        # int8 projection at padded length: one per-row quantization of
        # xp shared by the three weight-column slices (via int8_dense's
        # x_quant hook — single epilogue implementation), so the int8 MXU
        # rate composes with the fused-qkv prep win (no per-layer slice
        # copies / separate pads reappear)
        from endodav_tpu.ops.quant import _quantize_rows, int8_dense

        xq = _quantize_rows(xp)

        def proj(i):
            y = int8_dense(xp, w[:, i * c:(i + 1) * c],
                           bias[i * c:(i + 1) * c] if bias is not None else None,
                           out_dtype=x.dtype, x_quant=xq)
            return y.reshape(b, n_pad, heads, dh)
    else:
        def proj(i):
            y = jax.lax.dot_general(xp, w[:, i * c:(i + 1) * c],
                                    (((2,), (0,)), ((), ())))
            if bias is not None:
                y = y + bias[i * c:(i + 1) * c].astype(y.dtype)
            return y.reshape(b, n_pad, heads, dh)

    q, k, v = proj(0), proj(1), proj(2)
    return flash_attention(q, k, v, scale, n if n_pad != n else None)


def _forward(q, k, v, scale, n_valid=None):
    b, n_arr, h, dh = q.shape
    n = n_arr if n_valid is None else n_valid
    if scale is None:
        scale = dh ** -0.5
    n_pad = _round_up(n, 128)
    # 512 q-rows is the tuned bf16 tile; at f32 the q/out blocks and the
    # in-kernel [block_q, n_pad] score tiles double in bytes, and the
    # vitl-width f32 config lands 380 KB past the 16 MB scoped-vmem limit
    # (observed at N=321, H*Dh=1024) — halve the q tile for 4-byte dtypes.
    block_q = min(n_pad, 512 if q.dtype.itemsize <= 2 else 256)

    # heads fold into the lane dimension ([B, N, H*Dh] — a free reshape of
    # the native layout) and are peeled by lane slices inside the kernel,
    # so no [B,N,H,Dh]->[B,H,N,Dh] transpose is ever materialized in HBM —
    # the former prep/unprep relayouts cost more than the kernel itself at
    # N=1702 (47 ms vs 53 ms per 518px chunk, PERFORMANCE.md).  Only K/V
    # carry an explicit N-pad (masked + zeroed via the score mask); the
    # q-side edge block is Pallas padding whose garbage rows are clipped
    # on the output write.
    qf = q.reshape(b, n_arr, h * dh)
    kf = k.reshape(b, n_arr, h * dh)
    vf = v.reshape(b, n_arr, h * dh)
    if n_arr == n:
        if n_pad != n:
            kf = jnp.pad(kf, ((0, 0), (0, n_pad - n), (0, 0)))
            vf = jnp.pad(vf, ((0, 0), (0, n_pad - n), (0, 0)))
    else:
        # pre-padded inputs (qkv_flash_attention): k/v pad rows are bias
        # rows — finite, score-masked to zero weight in-kernel.
        assert n_arr == n_pad, (n_arr, n_pad)

    # Wide models (vitl: H*Dh=1024 at N=1703) blow the 16 MB VMEM budget
    # with whole K/V blocks (observed: 18 MB scoped-vmem OOM).  Heads are
    # independent, so a third parallel grid axis slices the lane dim into
    # head groups — no accumulation, each group writes its own lanes.
    groups = 1
    # 3 MB threshold: vits 518 (K+V 2.2 MB) keeps its tuned whole-lane
    # config; vitl 518 (7.3 MB) splits to 4 groups (~12 MB total with
    # the f32 score tiles, under the 16 MB scoped-vmem budget).
    while groups < h and 2 * n_pad * (h // groups) * dh * q.dtype.itemsize > 3 * 1024 * 1024:
        groups *= 2
    while h % groups:
        groups //= 2
    hg = h // groups

    # Ceil division: the q-grid must cover every valid row even when n_pad
    # is not a multiple of block_q (e.g. N=1703 at 518x644 -> n_pad=1792,
    # block_q=512 -> 4 blocks).  The edge block's out-of-range rows are
    # Pallas padding, clipped on the output write.
    #
    # Grid order (b, groups, q-blocks): the innermost axis varies fastest,
    # and Pallas elides an input DMA when its block index is unchanged
    # between consecutive steps — with qi innermost the K/V blocks (which
    # depend only on bi/gi) are fetched once per head group instead of
    # once per q-block (vitl: 4x less K/V traffic; vits has groups=1 and
    # sees no change).
    grid = (b, groups, pl.cdiv(n, block_q))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n, heads=hg, dh=dh),
        out_shape=jax.ShapeDtypeStruct((b, n, h * dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, hg * dh), lambda bi, gi, qi: (bi, qi, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, hg * dh), lambda bi, gi, qi: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, hg * dh), lambda bi, gi, qi: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, hg * dh), lambda bi, gi, qi: (bi, qi, gi),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qf, kf, vf)
    return out.reshape(b, n, h, dh)


def _fwd(q, k, v, scale, n_valid):
    return _forward(q, k, v, scale, n_valid), (q, k, v)


def _bwd(scale, n_valid, res, g):
    """XLA backward via recompute — N is small (≤1370), so the N×N scores
    tile is cheap to rebuild and XLA fuses the chain well.  For
    pre-padded inputs (n_valid set), g's rows are zero-padded back to the
    array length and the pad key columns are masked before the softmax;
    ds for masked columns is exactly zero, so dk/dv pad-row grads vanish
    and dq pad rows (g=0 rows) contribute nothing."""
    q, k, v = res
    n_arr = q.shape[1]
    dh = q.shape[-1]
    n = n_arr if n_valid is None else n_valid
    if n_arr != n:
        g = jnp.pad(g, ((0, 0), (0, n_arr - n), (0, 0), (0, 0)))
    sc = dh ** -0.5 if scale is None else scale
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * sc
    if n_arr != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n_arr), 3)
        s = jnp.where(col < n, s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k, preferred_element_type=jnp.float32) * sc
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q, preferred_element_type=jnp.float32) * sc
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
