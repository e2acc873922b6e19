#!/usr/bin/env python
# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

"""Streaming-serving latency benchmark (eval/streaming.DepthStreamer).

Measures what the offline throughput bench (bench.py) cannot: the
per-window latency a live endoscopy stream sees — time from the push
that completes a window to its finalized depth frames being host-ready
— plus time-to-first-depth and the steady-state frames/s implied by the
window cadence.

  python tools/bench_streaming.py [--config 518|224] [--frames 142]

Prints one human-readable block per config to stdout (not JSON; the
driver headline remains bench.py).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="224", choices=["224", "518"])
    ap.add_argument("--frames", type=int, default=142)  # 6 windows at step=22
    ap.add_argument("--tiny", action="store_true",
                    help="56x70 model input (CPU smoke test, not a benchmark)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval.streaming import DepthStreamer
    from endodav_tpu.models import EndoDAV
    from endodav_tpu.models.endodav import INFER_LEN, _endodav_lora_alpha
    from endodav_tpu.models.lora import merge_lora_params

    if args.tiny:
        src_hw, image_shape, residual_blocks = (64, 80), (56, 70), ()
    elif args.config == "518":
        src_hw, image_shape, residual_blocks = (512, 640), (518, 644), ()
    else:
        src_hw, image_shape, residual_blocks = (256, 320), (224, 280), (2, 5, 8, 11)

    # same production serving graph as bench.py: dvlora folded into the
    # base weights, bf16 compute
    lora_model = EndoDAV(encoder="vits", lora_type="dvlora",
                         residual_block_indexes=residual_blocks,
                         image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(lora_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, INFER_LEN, *image_shape, 3)))
    variables = {"params": merge_lora_params(
        variables["params"], "dvlora", 4, _endodav_lora_alpha("dvlora", 4))}
    model = EndoDAV(encoder="vits", lora_type="none",
                    residual_block_indexes=residual_blocks,
                    image_shape=image_shape, dtype=jnp.bfloat16)
    fwd = lambda win: model.apply(variables, win)[("disp", 0)]  # noqa: E731

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (args.frames, *src_hw, 3), dtype=np.uint8)

    # warm the compile (first window) on a throwaway stream
    warm = DepthStreamer(fwd, image_shape=image_shape, transfer_dtype=np.float16)
    for f in frames[:INFER_LEN]:
        warm.push(f)

    streamer = DepthStreamer(fwd, image_shape=image_shape, transfer_dtype=np.float16)
    t0 = time.time()
    first_depth_s = None
    window_lat = []
    emitted = 0
    for i, f in enumerate(frames):
        tp = time.time()
        out = streamer.push(f)
        if out:
            window_lat.append(time.time() - tp)
            emitted += len(out)
            if first_depth_s is None:
                first_depth_s = time.time() - t0
    tail = streamer.flush()
    total_s = time.time() - t0
    emitted += len(tail)

    lat = sorted(window_lat)
    med = lat[len(lat) // 2]
    step = INFER_LEN - 10  # OVERLAP
    print(f"[stream {args.config}] frames={args.frames} emitted={emitted} "
          f"windows={len(window_lat) + (1 if tail else 0)}")
    print(f"[stream {args.config}] time-to-first-depth {first_depth_s:.3f} s "
          f"(32-frame pipeline fill + first window)")
    print(f"[stream {args.config}] per-window latency median {med*1e3:.1f} ms "
          f"(min {lat[0]*1e3:.1f}, max {lat[-1]*1e3:.1f}; "
          f"{step} frames finalized per window -> "
          f"{step/med:.1f} frames/s steady-state ceiling)")
    print(f"[stream {args.config}] whole-stream wall {total_s:.2f} s "
          f"({args.frames/total_s:.1f} frames/s incl. host push overhead)")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
