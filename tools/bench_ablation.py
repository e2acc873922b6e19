"""Ablation matrix for the 518px window forward: where does the time go?

Times the full 2-window chunk forward under combinations of
{flash attention on/off, fused temporal block on/off, LoRA variant,
motion modules on/off} plus the bare ViT, at whole-model granularity
(decision-grade through the dev tunnel — see PERFORMANCE.md "Kernels"
for why microsecond timings are not).

Run: python tools/bench_ablation.py [--config 518|224] [--iters 5]
"""

from __future__ import annotations

# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

import argparse
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, chunks, iters):
    device_sync(run(chunks[0]))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        device_sync(run(chunks[i % len(chunks)]))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def model_time(image_shape, chunk_windows, iters, lora_type, rng):
    from endodav_tpu.models import EndoDAV

    model = EndoDAV(encoder="vits", lora_type=lora_type,
                    residual_block_indexes=(),
                    image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    run = jax.jit(lambda w: model.apply(variables, w)[("disp", 0)])
    chunks = [jnp.asarray(rng.uniform(0, 1, (chunk_windows, 32, *image_shape, 3)),
                          jnp.bfloat16) for _ in range(3)]
    return timeit(run, chunks, iters)


def vit_time(image_shape, chunk_windows, iters, rng):
    from endodav_tpu.models.vit import DinoViT

    m = DinoViT(dtype=jnp.bfloat16)  # vits defaults
    frames = chunk_windows * 32
    x = jnp.zeros((frames, *image_shape, 3), jnp.bfloat16)
    p = jax.jit(lambda k, w: m.init(k, w, (2, 5, 8, 11)))(jax.random.PRNGKey(0), x)
    run = jax.jit(lambda w: m.apply(p, w, (2, 5, 8, 11))[-1][0])
    chunks = [jnp.asarray(rng.uniform(0, 1, (frames, *image_shape, 3)),
                          jnp.bfloat16) for _ in range(3)]
    return timeit(run, chunks, iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    image_shape, cw = ((518, 644), 2) if args.config == "518" else ((224, 280), 5)
    frames = cw * 32
    rng = np.random.default_rng(0)

    rows = []

    def case(label, env, fn):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update({k: v for k, v in env.items() if v})
        for k, v in env.items():
            if not v:
                os.environ.pop(k, None)
        try:
            t = fn()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        rows.append((label, t))
        print(f"{label}: {t*1e3:.1f} ms ({frames/t:.1f} fps)", flush=True)

    mt = lambda lora="dvlora": (lambda: model_time(image_shape, cw, args.iters, lora, rng))
    case("full (flash+fused, dvlora)", {}, mt())
    case("no flash", {"ENDODAV_NO_FLASH": "1"}, mt())
    case("no fused temporal", {"ENDODAV_NO_FUSED": "1"}, mt())
    case("no flash, no fused", {"ENDODAV_NO_FLASH": "1", "ENDODAV_NO_FUSED": "1"}, mt())
    case("lora=none", {}, mt("none"))
    case("ViT-S alone (taps)", {}, lambda: vit_time(image_shape, cw, args.iters, rng))


if __name__ == "__main__":
    main()
