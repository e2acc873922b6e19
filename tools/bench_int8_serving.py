#!/usr/bin/env python
"""Whole-model A/B of the int8 serving GEMM path (ENDODAV_INT8=1).

Builds the production serving graph — merged-LoRA (variant "none"), so
ALL four quantized projections (fc1/fc2/qkv/proj) engage — and times the
device-resident window-chunk forward exactly like bench.py's
compute-only measurement, once per mode inside one process (the env
flag is read at trace time; each mode gets its own jit).  Also reports
the max/mean disparity deviation between the two modes on the same
input, so the speed number is never quoted without its numerics cost.

  python tools/bench_int8_serving.py [--config 518|224] [--iters 6] [--encoder vits|vitl]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402 (needs sys.path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"])
    ap.add_argument("--tiny", action="store_true",
                    help="56x70 smoke config (CPU CI of the A/B harness itself)")
    args = ap.parse_args()

    import jax

    # the axon sitecustomize pins jax_platforms from the config side; make
    # the conventional env var effective so --tiny CPU smokes work offline
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from endodav_tpu.eval import video_inference as vi
    from endodav_tpu.models import EndoDAV
    from endodav_tpu.models.endodav import _endodav_lora_alpha
    from endodav_tpu.models.lora import merge_lora_params

    if args.tiny:
        src_hw, image_shape, cw = (64, 80), (56, 70), 1
        residual_blocks = ()
    elif args.config == "518":
        src_hw, image_shape, cw = (512, 640), (518, 644), 4
        residual_blocks = ()
    else:
        src_hw, image_shape, cw = (256, 320), (224, 280), 5
        residual_blocks = (2, 5, 8, 11)
    if args.encoder == "vitl":
        cw = min(cw, 1)
        os.environ.setdefault("ENDODAV_SPLIT_COMPILE", "1")

    lora_model = EndoDAV(encoder=args.encoder, lora_type="dvlora",
                         residual_block_indexes=residual_blocks,
                         image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(lora_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    variables = {"params": merge_lora_params(
        variables["params"], "dvlora", 4, _endodav_lora_alpha("dvlora", 4))}
    model = EndoDAV(encoder=args.encoder, lora_type="none",
                    residual_block_indexes=residual_blocks,
                    image_shape=image_shape, dtype=jnp.bfloat16)

    th, tw = vi.keep_aspect_size(*src_hw, *image_shape)
    rng = np.random.default_rng(0)
    chunks = [jnp.asarray(rng.uniform(0, 1, (cw, 32, th, tw, 3)),
                          jnp.bfloat16) for _ in range(args.iters + 1)]
    frames_per_chunk = cw * 32

    from endodav_tpu.eval.engine import depth_window_forward

    results = {}
    outs = {}
    for mode in ("bf16", "int8"):
        if mode == "int8":
            os.environ["ENDODAV_INT8"] = "1"
        else:
            os.environ.pop("ENDODAV_INT8", None)

        # fresh jits per mode: the env flag is read at trace time
        run = depth_window_forward(model, variables, "endodav")
        t0 = time.perf_counter()
        out = run(chunks[0])
        device_sync(out)  # device_sync RETURNS a scalar — keep `out` whole
        print(f"[{mode}] compile {time.perf_counter()-t0:.1f}s", flush=True)
        # deviation over the FULL chunk (a frame-0 slice would understate
        # artifacts on later frames; a round-3 migration bug compared a
        # single fetched SCALAR here and printed deviation 0.0000);
        # one extra transfer in a benchmark
        outs[mode] = np.asarray(out, np.float32)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            device_sync(run(chunks[i + 1]))
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        results[mode] = ms
        print(f"[{mode}] {ms:.1f} ms/chunk -> {frames_per_chunk/ms*1e3:.1f} fps "
              f"(all: {', '.join(f'{t*1e3:.0f}' for t in times)})", flush=True)

    diff = np.abs(outs["int8"] - outs["bf16"])
    print(f"speedup int8/bf16: {results['bf16']/results['int8']:.3f}x | "
          f"disp deviation max {diff.max():.4f} mean {diff.mean():.5f} "
          f"(bf16 disp mean {outs['bf16'].mean():.4f})")


if __name__ == "__main__":
    main()
