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


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, H, DH)), jnp.bfloat16)
               for _ in range(3))
    scale = DH ** -0.5

    cur = jax.jit(lambda q, k, v: _forward(q, k, v, scale))
    pad = jax.jit(lambda q, k, v: padded_forward(q, k, v, scale))
    a = cur(q, k, v)
    b_ = pad(q, k, v)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
    print(f"max err vs current: {err:.2e}")

    for label, fn in (("current 64-lane slices", cur), ("padded 128-lane slices", pad)):
        jax.block_until_ready(fn(q, k, v))
        rows = device_profile(lambda: fn(q, k, v), top=30)
        tot = sum(ms for name, n_, ms in rows
                  if not name.startswith("jit_") and not name.isdigit())
        print(f"{label}: {tot:.1f} ms device total")
        for name, n_, ms in rows[:4]:
            print(f"   {name[:60]}: n={n_} {ms:.2f} ms")


if __name__ == "__main__":
    main()
