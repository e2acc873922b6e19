"""Bound the spatial-attention backward's share of the train step (VERDICT #10).

Measures, at the ViT-S spatial attention shape (N=321 tokens, H=6, Dh=64):
  * forward: Pallas flash kernel vs XLA
  * fwd+bwd: flash fwd + XLA-recompute custom_vjp bwd vs pure XLA autodiff
for the training batch (B=T=16 frames) and the serving batch (160 frames),
then relates 12 layers' worth of cost to the measured step times
(PERFORMANCE.md: 3.10 s/step train, 0.97 ms/frame serving compute).

Run: python tools/bench_attention_backward.py
"""

from __future__ import annotations

# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

import time

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.kernels.flash_attention import flash_attention
from endodav_tpu.ops.attention import _xla_attention

N, H, DH = 321, 6, 64
LAYERS = 12


def timeit(fn, q, *rest, iters=100):
    """Chained timing: each iteration's q is the previous output, so no
    runtime/relay layer can coalesce or cache identical executions and
    device work is strictly serialized."""
    out = fn(q, *rest)
    first = out[0] if isinstance(out, tuple) else out
    device_sync(first)
    t0 = time.perf_counter()
    state = q
    for _ in range(iters):
        out = fn(state, *rest)
        state = out[0] if isinstance(out, tuple) else out
    device_sync(state)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    scale = DH ** -0.5
    print(f"backend={jax.default_backend()}  shape N={N} H={H} Dh={DH}, bf16")
    print("| B (frames) | flash fwd us | XLA fwd us | flash fwd+bwd us | XLA fwd+bwd us | 12-layer bwd-chain ms |")
    print("|---|---|---|---|---|---|")
    for b in (16, 160):
        q, k, v = (jnp.asarray(rng.standard_normal((b, N, H, DH)), jnp.bfloat16)
                   for _ in range(3))

        f_fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        x_fwd = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
        f_g = jax.jit(jax.grad(
            lambda q, k, v: (flash_attention(q, k, v, scale).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1, 2)))
        x_g = jax.jit(jax.grad(
            lambda q, k, v: (_xla_attention(q, k, v, scale).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1, 2)))

        tf, tx = timeit(f_fwd, q, k, v), timeit(x_fwd, q, k, v)
        tfg, txg = timeit(f_g, q, k, v), timeit(x_g, q, k, v)
        print(f"| {b} | {tf:.0f} | {tx:.0f} | {tfg:.0f} | {txg:.0f} | "
              f"{min(tfg, txg) * LAYERS / 1e3:.2f} |")

    print("\ncontext: train step = 3.10 s (B=1,T=16); serving compute = "
          "0.97 ms/frame -> 155 ms per 160-frame batch (PERFORMANCE.md)")


if __name__ == "__main__":
    main()
