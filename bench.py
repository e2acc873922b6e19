#!/usr/bin/env python
"""Benchmark: sliding-window video-depth throughput on one chip.

Measures the serving hot path (endodav.infer_video_depth counterpart,
SURVEY.md §3.2) end-to-end: uint8 upload, device preprocessing, batched
window forward, full-res upsample, overlapped device->host transfer and
host stitch, on synthetic SCARED-shaped frames (256x320 -> model-internal
224x280, ViT-S video model, bf16).

`vs_baseline` is the speedup over the reference's *sequential* window
schedule executed on the same chip (window-at-a-time with a synchronous
output copy per window — a faithful emulation of endodav.py:193-208),
i.e. the measured gain of the TPU-first redesign on identical hardware.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval.video_inference import infer_video_depth
    from endodav_tpu.models import EndoDAV

    n_frames, h, w = 110, 256, 320
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)

    model = EndoDAV(encoder="vits", lora_type="dvlora", residual_block_indexes=(2, 5, 8, 11),
                    dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 224, 280, 3)))

    def fwd(win):
        return model.apply(variables, win)[("disp", 0)]

    def run_fast():
        return infer_video_depth(fwd, frames, chunk_windows=5,
                                 transfer_dtype=np.float16, stitch="device")

    def run_reference():
        # faithful emulation of the reference schedule: one window at a
        # time, synchronous full-precision output copy, host stitch
        return infer_video_depth(fwd, frames, chunk_windows=1,
                                 transfer_dtype=np.float32, stitch="host", sequential=True)

    run_fast()       # compile batched path
    run_reference()  # compile sequential path

    def best_of(fn, n=3):
        # the dev tunnel's transfer rate drifts; take the best of n runs
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return min(times)

    batched_s = best_of(run_fast)
    sequential_s = best_of(run_reference)

    fps = n_frames / batched_s
    print(json.dumps({
        "metric": "video_depth_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(sequential_s / batched_s, 3),
    }))


if __name__ == "__main__":
    main()
