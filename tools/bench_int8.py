#!/usr/bin/env python
"""Probe: does int8 on the v5e MXU actually double GEMM throughput?

v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16.  If real at our shapes,
weight+activation int8 quantization of the ViT GEMMs (the ~45%-MFU
compute core of the serving profile) is the one remaining large serving
lever — this measures the ceiling before any quantization work is
committed.  Honest accounting: the int8 timing includes dynamic
per-row activation quantization and the f32 rescale epilogue, i.e. the
full runtime cost a served int8 layer would pay (weights pre-quantized
offline).

  python tools/bench_int8.py
"""

import time

import numpy as np


def _sync(out):
    # scalar-index fetch: block_until_ready returns early on a saturated
    # axon relay (endodav_tpu/utils/devsync.py)
    return np.asarray(out[(0,) * out.ndim])


def bench(fn, *args, reps=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    # (rows, in, out): ViT-S attention/MLP at 518px tokens, ViT-L widths
    shapes = [
        (64 * 1370, 384, 1152),   # vits fused-qkv, 518px chunk (B*N rows)
        (64 * 1370, 384, 1536),   # vits MLP up
        (64 * 1370, 1536, 384),   # vits MLP down
        (32 * 1370, 1024, 3072),  # vitl fused-qkv
        (32 * 1370, 1024, 4096),  # vitl MLP up
    ]

    for rows, cin, cout in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((rows, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((cin, cout)), jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 127, (cin, cout)), jnp.int8)
        wscale = jnp.asarray(rng.uniform(0.01, 0.02, (cout,)), jnp.float32)

        @jax.jit
        def f_bf16(x, w):
            return jnp.dot(x, w)

        @jax.jit
        def f_int8(x, w8, wscale):
            # dynamic per-row activation quant + int8 MXU + f32 rescale
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
            xs = amax / 127.0
            x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs * wscale[None, :]).astype(jnp.bfloat16)

        t_bf = bench(f_bf16, x, w)
        t_i8 = bench(f_int8, x, w8, wscale)
        flops = 2 * rows * cin * cout
        print(f"[{rows}x{cin}x{cout}] bf16 {t_bf*1e3:7.2f} ms "
              f"({flops/t_bf/1e12:6.1f} TFLOP/s) | int8(+quant+rescale) "
              f"{t_i8*1e3:7.2f} ms ({flops/t_i8/1e12:6.1f} TOP/s) | "
              f"speedup {t_bf/t_i8:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
