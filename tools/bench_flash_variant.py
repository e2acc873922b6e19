"""Flash-attention micro A/B: lane-aligned (head-padded) variant.

The production kernel peels H=6 heads as 64-lane slices of [*, 384];
half those offsets are 128-misaligned, which may force Mosaic relayouts.
This variant pads each head to 128 lanes ([B, N, H*128]) so every slice
is tile-aligned — exact (zero lanes contribute nothing to the dots).

Measures whole-kernel device time at the 518px production shape via the
profiler (tools/profile_device.py).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

from endodav_tpu.kernels.flash_attention import _MASK_VALUE, _forward
from tools.profile_device import device_profile

B, N, H, DH = 64, 1702, 6, 64


def _kernel_padded(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, heads):
    q = q_ref[0]  # [block_q, H*128]
    k = k_ref[0]  # [n_pad, H*128]
    v = v_ref[0]
    n_pad = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], n_pad), 1)
    for hh in range(heads):
        sl = slice(hh * 128, (hh + 1) * 128)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if n_valid != n_pad:
            s = jnp.where(col < n_valid, s, _MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def padded_forward(q, k, v, scale):
    b, n, h, dh = q.shape
    n_pad = (n + 127) // 128 * 128
    block_q = min(n_pad, 256)  # 512 exceeds the 16 MB VMEM budget at 768 lanes
    pad_spec = ((0, 0), (0, 0), (0, 0), (0, 128 - dh))
    qf = jnp.pad(q, pad_spec).reshape(b, n, h * 128)
    kf = jnp.pad(k, pad_spec).reshape(b, n, h * 128)
    vf = jnp.pad(v, pad_spec).reshape(b, n, h * 128)
    if n_pad != n:
        kf = jnp.pad(kf, ((0, 0), (0, n_pad - n), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_padded, scale=scale, n_valid=n, heads=h),
        out_shape=jax.ShapeDtypeStruct((b, n, h * 128), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, n_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, h * 128), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * 128), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * 128), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, h * 128), lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)
    return out.reshape(b, n, h, 128)[..., :dh]


def _kernel_mxu_denom(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, heads, dh):
    """Variant: kill the N^2 mask `where` pass and move the softmax
    denominator off the VPU onto the MXU.

    K/V arrive zero-padded, so pad columns score exactly 0 (q . 0):
    max(s) over them is still a valid stability shift (>= 0), their
    exp(s-m) rows multiply zero V rows in the numerator, and the
    denominator excludes them by contracting p with a 0/1 mask column on
    the MXU (one extra dot sharing p's VMEM residency) instead of a VPU
    cross-lane sum over the masked scores.  Remaining N^2 VPU work: one
    max-reduce + one fused sub/exp/convert."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    n_pad = k.shape[0]
    maskc = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, 128), 0)
             < n_valid).astype(v.dtype)
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = (q[:, sl].astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m).astype(v.dtype)
        o = jax.lax.dot(p, v[:, sl], preferred_element_type=jnp.float32)
        denom = jax.lax.dot(p, maskc, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / denom[:, :1]).astype(o_ref.dtype)


def mxu_denom_forward(q, k, v, scale):
    b, n, h, dh = q.shape
    n_pad = (n + 127) // 128 * 128
    block_q = min(n_pad, 512)
    qf = q.reshape(b, n, h * dh)
    kf = k.reshape(b, n, h * dh)
    vf = v.reshape(b, n, h * dh)
    if n_pad != n:
        kf = jnp.pad(kf, ((0, 0), (0, n_pad - n), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_mxu_denom, scale=scale, n_valid=n,
                          heads=h, dh=dh),
        out_shape=jax.ShapeDtypeStruct((b, n, h * dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, pl.cdiv(n, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, h * dh), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * dh), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * dh), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, h * dh), lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)
    return out.reshape(b, n, h, dh)


def _kernel_bf16_softmax(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid,
                         heads, dh):
    """Variant: run the N^2 softmax chain in bf16.

    The f32 score tile converts to bf16 right after the mask; max / sub /
    exp / sum / div then process 2x the elements per vreg if Mosaic packs
    bf16 on the VPU.  Accuracy cost ~0.4% relative on p — same order as
    the bf16 P@V input cast the production kernel already does."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    n_pad = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], n_pad), 1)
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = (q[:, sl].astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if n_valid != n_pad:
            s = jnp.where(col < n_valid, s, _MASK_VALUE)
        sb = s.astype(jnp.bfloat16)
        m = jnp.max(sb, axis=1, keepdims=True)
        p = jnp.exp(sb - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p, v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def bf16_softmax_forward(q, k, v, scale):
    b, n, h, dh = q.shape
    n_pad = (n + 127) // 128 * 128
    block_q = min(n_pad, 512)
    qf = q.reshape(b, n, h * dh)
    kf = jnp.pad(k.reshape(b, n, h * dh), ((0, 0), (0, n_pad - n), (0, 0)))
    vf = jnp.pad(v.reshape(b, n, h * dh), ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_bf16_softmax, scale=scale, n_valid=n,
                          heads=h, dh=dh),
        out_shape=jax.ShapeDtypeStruct((b, n, h * dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, pl.cdiv(n, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, h * dh), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * dh), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, h * dh), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, h * dh), lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)
    return out.reshape(b, n, h, dh)


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, H, DH)), jnp.bfloat16)
               for _ in range(3))
    scale = DH ** -0.5

    cur = jax.jit(lambda q, k, v: _forward(q, k, v, scale))
    pad = jax.jit(lambda q, k, v: padded_forward(q, k, v, scale))
    mxd = jax.jit(lambda q, k, v: mxu_denom_forward(q, k, v, scale))
    b16 = jax.jit(lambda q, k, v: bf16_softmax_forward(q, k, v, scale))
    a = cur(q, k, v)
    for name, fn in (("padded", pad), ("mxu_denom", mxd), ("bf16_softmax", b16)):
        b_ = fn(q, k, v)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
        print(f"max err {name} vs current: {err:.2e}")

    for label, fn in (("current 64-lane slices", cur),
                      ("padded 128-lane slices", pad),
                      ("mxu-denominator mask-free", mxd),
                      ("bf16 softmax chain", b16)):
        device_sync(fn(q, k, v))
        rows = device_profile(lambda: fn(q, k, v), top=30)
        tot = sum(ms for name, n_, ms in rows
                  if not name.startswith("jit_") and not name.isdigit())
        print(f"{label}: {tot:.1f} ms device total")
        for name, n_, ms in rows[:4]:
            print(f"   {name[:60]}: n={n_} {ms:.2f} ms")


if __name__ == "__main__":
    main()
