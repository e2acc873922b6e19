"""Decision-grade A/B of the fused temporal block: full-model window forward.

Microsecond kernel timings through the dev tunnel are unreliable (the
same attention computation measured 17 us and 2378 us minutes apart), so
the fused-vs-XLA routing decision is made at whole-window granularity —
hundreds of ms per iteration, where relay overhead and caching effects
are in the noise.  Distinct pre-staged input chunks are cycled so no two
executions see identical buffers.

Run: python tools/bench_fused_e2e.py [--config 518|224] [--iters 6]
"""

from __future__ import annotations

# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.utils.devsync import device_sync


def measure(fused: bool, image_shape, chunk_windows, iters: int,
            grad: bool = False, frames: int = 32, encoder: str = "vits"):
    from endodav_tpu.models import EndoDAV
    from endodav_tpu.models import motion as motion_mod

    orig = motion_mod._use_fused_block
    motion_mod._use_fused_block = (lambda *a: False) if not fused else orig
    try:
        model = EndoDAV(encoder=encoder, lora_type="dvlora",
                        residual_block_indexes=(),
                        image_shape=image_shape, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, frames, *image_shape, 3)))
        if grad:
            def loss(params, w):
                d = model.apply(params, w)[("disp", 0)]
                return (d.astype(jnp.float32) ** 2).mean()

            step = jax.jit(jax.grad(loss))
            run = lambda w: step(variables, w)
        else:
            run = jax.jit(lambda w: model.apply(variables, w)[("disp", 0)])

        # one distinct buffer per timed call — repeated (executable, args)
        # pairs have produced impossibly fast times through the relay
        rng = np.random.default_rng(0)
        chunks = [jnp.asarray(
            rng.uniform(0, 1, (chunk_windows, frames, *image_shape, 3)),
            jnp.bfloat16) for _ in range(iters + 1)]
        device_sync(run(chunks[0]))  # compile
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            device_sync(run(chunks[i + 1]))
            times.append(time.perf_counter() - t0)
        return times
    finally:
        motion_mod._use_fused_block = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (training regime, T=16) instead of forward")
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"])
    args = ap.parse_args()
    image_shape, chunk_windows = ((518, 644), 2) if args.config == "518" else ((224, 280), 5)
    frames = chunk_windows * 32
    t_frames = 32
    if args.grad:
        # training regime: B=1, T=16 (scripts/train_video.sh)
        chunk_windows, t_frames = 1, 16
        frames = t_frames

    if args.encoder == "vitl":
        chunk_windows = 1
        frames = chunk_windows * t_frames
    for fused in (False, True):
        times = measure(fused, image_shape, chunk_windows, args.iters,
                        grad=args.grad, frames=t_frames, encoder=args.encoder)
        med = statistics.median(times)
        print(f"fused={fused} grad={args.grad} {args.encoder}: median {med*1e3:.1f} ms "
              f"({frames/med:.1f} fps) "
              f"all={['%.0f' % (t*1e3) for t in times]}")


if __name__ == "__main__":
    main()
