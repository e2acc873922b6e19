"""Measure the fused temporal-block Pallas kernel against XLA on TPU.

Shapes are the four motion-module call sites of the vits DPT decoder
(models/dpt.py:177-194) for one window (B=1, T=32) at both the
reference-default 224x280 internal resolution (16x20 patch grid) and
the 518px headline config (518x644 -> 37x46 grid).

Run:  python tools/bench_temporal_kernel.py [--rows 32 64 128] [--dtype bf16]
Prints one markdown table; updates nothing.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.kernels.fused_temporal_block import (
    fused_temporal_block, reference_block)

# (label, B*, T, C, heads)
SHAPES = [
    ("224 layer_3", 320, 32, 192, 8),
    ("224 layer_4", 80, 32, 384, 8),
    ("224 path_4", 320, 32, 64, 8),
    ("224 path_3", 1280, 32, 64, 8),
    ("518 layer_3", 1702, 32, 192, 8),
    ("518 layer_4", 437, 32, 384, 8),
    ("518 path_4", 1702, 32, 64, 8),
    ("518 path_3", 6808, 32, 64, 8),
]

# vitl motion widths (ENDODAV_CONFIGS["vitl"]: out_channels 1024/1024,
# features 256); C=1024 routes to the head-grouped kernel.
VITL_SHAPES = [
    ("vitl518 layer_3", 1702, 32, 1024, 8),
    ("vitl518 layer_4", 437, 32, 1024, 8),
    ("vitl518 path_4", 1702, 32, 256, 8),
    ("vitl518 path_3", 6808, 32, 256, 8),
    ("vitl224 layer_3", 320, 32, 1024, 8),
    ("vitl224 layer_4", 80, 32, 1024, 8),
]


def _barrier(a):
    """True completion barrier: a value read cannot return early.
    block_until_ready through this environment's axon relay returns
    early on ~100 MB buffers (observed: 26 us 'measurements' of an
    8 ms computation), so every timing syncs by reading a value."""
    return float(jnp.sum(a[0, 0]))


def timeit(fn, x, *rest, iters=20):
    """Chained timing: iteration i+1 consumes iteration i's output, so no
    runtime/relay layer can coalesce or cache identical executions."""
    _barrier(fn(x, *rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *rest)
    _barrier(x)
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    _barrier(x)  # the barrier's own relay cost, subtracted
    ovh = time.perf_counter() - t1
    return max(dt - ovh, 0.0) / iters * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--set", default="vits", choices=["vits", "vitl"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} dtype={args.dtype}")
    print("| shape (B*,T,C) | XLA us | " +
          " | ".join(f"pallas r{r} us" for r in args.rows) + " | best speedup |")
    print("|---|---|" + "---|" * len(args.rows) + "---|")
    for label, bstar, t, c, heads in (VITL_SHAPES if args.set == "vitl" else SHAPES):
        x = jnp.asarray(rng.standard_normal((bstar, t, c)), dtype)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        pe = jnp.asarray(rng.standard_normal((t, c)) * 0.02, jnp.float32)
        wq, wk, wv, wo = (jnp.asarray(rng.standard_normal((c, c)) * c ** -0.5, dtype)
                          for _ in range(4))
        bo = jnp.zeros((c,), dtype)
        ref = jax.jit(lambda *a: reference_block(*a, heads=heads))
        t_xla = timeit(ref, x, gamma, beta, pe, wq, wk, wv, wo, bo, iters=args.iters)
        cols, best = [], float("inf")
        for rows in args.rows:
            try:
                fused = jax.jit(
                    lambda *a, _r=rows: fused_temporal_block(*a, heads, _r))
                tp = timeit(fused, x, gamma, beta, pe, wq, wk, wv, wo, bo,
                            iters=args.iters)
                # correctness spot-check
                err = float(jnp.max(jnp.abs(
                    fused(x, gamma, beta, pe, wq, wk, wv, wo, bo).astype(jnp.float32)
                    - ref(x, gamma, beta, pe, wq, wk, wv, wo, bo).astype(jnp.float32))))
                cols.append(f"{tp:.0f} (err {err:.1e})")
                best = min(best, tp)
            except Exception as e:  # noqa: BLE001
                cols.append(f"FAIL {type(e).__name__}")
        sp = t_xla / best if best < float("inf") else 0.0
        print(f"| {label} ({bstar},{t},{c}) | {t_xla:.0f} | " +
              " | ".join(cols) + f" | {sp:.2f}x |")


if __name__ == "__main__":
    main()
