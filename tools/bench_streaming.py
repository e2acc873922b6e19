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

Runs BOTH modes for a same-tunnel A/B:
  * baseline — the full 32-frame window forward per window;
  * dedup    — per-frame trunk encode at push + per-window temporal
    head (DepthStreamer dedup mode): the window critical path drops the
    re-encode of all 31 already-seen frames, and the fresh-frame
    encodes ride the camera inter-arrival gaps.  For dedup the
    per-*push* encode latency is also reported — it must sit under the
    camera frame interval for real-time operation.

  python tools/bench_streaming.py [--config 518|224] [--frames 142]

Prints one human-readable block per mode to stdout (not JSON; the
driver headline remains bench.py).
"""

import argparse
import sys
import time

import numpy as np


def run_stream(make_streamer, frames, INFER_LEN, label):
    # warm the compiles (first window) on a throwaway stream
    warm = make_streamer()
    for f in frames[: INFER_LEN + 1]:
        warm.push(f)

    streamer = make_streamer()
    t0 = time.time()
    first_depth_s = None
    window_lat, push_lat = [], []
    emitted = 0
    for f in frames:
        tp = time.time()
        out = streamer.push(f)
        dt = time.time() - tp
        if out:
            window_lat.append(dt)
            emitted += len(out)
            if first_depth_s is None:
                first_depth_s = time.time() - t0
        else:
            push_lat.append(dt)
    tail = streamer.flush()
    total_s = time.time() - t0
    emitted += len(tail)

    lat = sorted(window_lat)
    med = lat[len(lat) // 2]
    step = INFER_LEN - 10  # OVERLAP
    n = len(frames)
    print(f"[stream {label}] frames={n} emitted={emitted} "
          f"windows={len(window_lat) + (1 if tail else 0)}")
    print(f"[stream {label}] time-to-first-depth {first_depth_s:.3f} s "
          f"(32-frame pipeline fill + first window)")
    print(f"[stream {label}] per-window latency median {med*1e3:.1f} ms "
          f"(min {lat[0]*1e3:.1f}, max {lat[-1]*1e3:.1f}; "
          f"{step} frames finalized per window -> "
          f"{step/med:.1f} frames/s steady-state ceiling)")
    if push_lat:
        pl = sorted(push_lat)
        extra = (" — includes the one-frame encode" if "dedup" in label
                 else "")
        print(f"[stream {label}] per-push latency median {pl[len(pl)//2]*1e3:.1f} ms "
              f"(max {pl[-1]*1e3:.1f}){extra}")
    print(f"[stream {label}] whole-stream wall {total_s:.2f} s "
          f"({n/total_s:.1f} frames/s incl. host push overhead)")
    sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="224", choices=["224", "518"])
    ap.add_argument("--frames", type=int, default=142)  # 6 windows at step=22
    ap.add_argument("--tiny", action="store_true",
                    help="56x70 model input (CPU smoke test, not a benchmark)")
    ap.add_argument("--mode", default="both", choices=["both", "baseline", "dedup"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval.streaming import DepthStreamer
    from endodav_tpu.eval.video_inference import dedup_window_forward
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

    if args.mode in ("both", "baseline"):
        run_stream(lambda: DepthStreamer(fwd, image_shape=image_shape,
                                         transfer_dtype=np.float16),
                   frames, INFER_LEN, f"{args.config} baseline")
    if args.mode in ("both", "dedup"):
        dedup = dedup_window_forward(model, variables)
        run_stream(lambda: DepthStreamer(fwd, image_shape=image_shape,
                                         transfer_dtype=np.float16, dedup=dedup),
                   frames, INFER_LEN, f"{args.config} dedup")


if __name__ == "__main__":
    main()
