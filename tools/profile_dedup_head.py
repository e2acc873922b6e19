#!/usr/bin/env python
# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

"""Device op-category profile of the DEDUP pipeline's two jits.

The 518px dedup headline (210.5 source-fps, MFU 20.2%) splits into
~386 ms of unique-frame encodes and ~515 ms of per-chunk temporal DPT
heads (PERFORMANCE.md "Dedup").  The round-5 serving target is the
head's resize->conv chains (cross-op fusion, VERDICT task 1) — this
tool shows where the head's device time actually goes, op-by-op and
source-line-by-source-line, so fusion candidates are picked from
measurements instead of FLOP arithmetic.

Run: python tools/profile_dedup_head.py [--config 518|224] [--cw 4]
     [--leg head|encode|both]
"""

import argparse
import glob
import gzip
import json
import re
import tempfile

import numpy as np


def profile_call(fn, *args):
    """Run fn once traced; return (total_ms, cats, srcs) aggregates."""
    import jax

    from endodav_tpu.utils.devsync import device_sync

    d = tempfile.mkdtemp()
    with jax.profiler.trace(d):
        device_sync(fn(*args))
    events = []
    for p in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
        events.extend(json.load(gzip.open(p)).get("traceEvents", []))
    pids = {e.get("pid") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    total, cats, srcs = 0.0, {}, {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        dur = e.get("dur", 0.0)
        total += dur
        a = e.get("args") or {}
        tf = str(a.get("tf_op", ""))
        op = tf.split("/")[-1].rstrip(":") if tf else "?"
        cats.setdefault(op, [0, 0.0])
        cats[op][0] += 1
        cats[op][1] += dur
        src = str(a.get("source", "?"))
        key = f"{op} @ {src}"
        for k in (src, key):
            srcs.setdefault(k, [0, 0.0])
            srcs[k][0] += 1
            srcs[k][1] += dur
    return total, cats, srcs


def report(tag, total, cats, srcs, top=18):
    print(f"--- {tag}: {total/1e3:.1f} ms device ---")
    print("by op (top {}):".format(top))
    for k, (c, dd) in sorted(cats.items(), key=lambda kv: -kv[1][1])[:top]:
        print(f"  {dd/1e3:8.2f} ms n={c:5d} {k}")
    print("by op@source (top {}):".format(top + 7))
    shown = 0
    for k, (c, dd) in sorted(srcs.items(), key=lambda kv: -kv[1][1]):
        if " @ " not in k:
            continue
        print(f"  {dd/1e3:8.2f} ms n={c:5d} {k}")
        shown += 1
        if shown >= top + 7:
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    ap.add_argument("--cw", type=int, default=4)
    ap.add_argument("--fb", type=int, default=32)
    ap.add_argument("--leg", default="both", choices=["head", "encode", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import video_inference as vi
    from endodav_tpu.models import EndoDAV
    from endodav_tpu.models.endodav import _endodav_lora_alpha
    from endodav_tpu.models.lora import merge_lora_params
    from endodav_tpu.utils.devsync import device_sync

    if args.config == "518":
        src_hw, image_shape, residual_blocks = (512, 640), (518, 644), ()
    else:
        src_hw, image_shape, residual_blocks = (256, 320), (224, 280), (2, 5, 8, 11)

    lora_model = EndoDAV(encoder="vits", lora_type="dvlora",
                         residual_block_indexes=residual_blocks,
                         image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(lora_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    variables = {"params": merge_lora_params(
        variables["params"], "dvlora", 4, _endodav_lora_alpha("dvlora", 4))}
    model = EndoDAV(encoder="vits", lora_type="none",
                    residual_block_indexes=residual_blocks,
                    image_shape=image_shape, dtype=jnp.bfloat16)

    dedup = vi.dedup_window_forward(model, variables)
    th, tw = vi.keep_aspect_size(*src_hw, *image_shape)
    rng = np.random.default_rng(0)

    batch = jnp.asarray(rng.uniform(0, 1, (args.fb, th, tw, 3)).astype(np.float32))
    maps = dedup.encode(variables, batch)
    device_sync(maps)

    if args.leg in ("encode", "both"):
        total, cats, srcs = profile_call(
            lambda b: dedup.encode(variables, b), batch)
        report(f"{args.config} dedup ENCODE fb={args.fb}", total, cats, srcs)

    if args.leg in ("head", "both"):
        # cw windows' worth of slot indices; the head gathers in-jit
        n_slots = args.cw * 32
        widx = jnp.asarray(rng.integers(0, args.fb, n_slots))
        head = dedup.head_for(*src_hw, np.float16)
        device_sync(head(variables, widx, *maps))
        total, cats, srcs = profile_call(
            lambda *ms: head(variables, widx, *ms), *maps)
        report(f"{args.config} dedup HEAD cw={args.cw} ({n_slots} slots)",
               total, cats, srcs)
        print(f"per-slot: {total/1e3/n_slots:.3f} ms")


if __name__ == "__main__":
    main()
