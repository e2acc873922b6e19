"""Device-side op-category profile of the serving window forward.

Where do the 87% of non-MFU cycles go at 518px?  Profiles one compiled
window-chunk forward with jax.profiler (the trustworthy path — see
PERFORMANCE.md) and aggregates device op durations by category and by
source line.

Run: python tools/profile_serving.py [--config 518|224]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    args = ap.parse_args()
    image_shape, cw = ((518, 644), 2) if args.config == "518" else ((224, 280), 5)

    from endodav_tpu.models import EndoDAV

    model = EndoDAV(encoder="vits", lora_type="dvlora", residual_block_indexes=(),
                    image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    fwd = jax.jit(lambda w: model.apply(variables, w)[("disp", 0)])
    rng = np.random.default_rng(0)
    chunks = [jnp.asarray(rng.uniform(0, 1, (cw, 32, *image_shape, 3)), jnp.bfloat16)
              for _ in range(2)]
    device_sync(fwd(chunks[0]))

    d = tempfile.mkdtemp()
    with jax.profiler.trace(d):
        device_sync(fwd(chunks[1]))
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
        srcs.setdefault(src, [0, 0.0])
        srcs[src][0] += 1
        srcs[src][1] += dur
        key = f"{op} @ {src}"
        srcs.setdefault(key, [0, 0.0])
        srcs[key][0] += 1
        srcs[key][1] += dur

    print(f"--- {args.config} chunk forward: {total/1e3:.1f} ms device ---")
    print("by op (top 15):")
    for k, (c, dd) in sorted(cats.items(), key=lambda kv: -kv[1][1])[:15]:
        print(f"  {dd/1e3:8.1f} ms n={c:5d} {k}")
    print("by source (top 15):")
    for k, (c, dd) in sorted(srcs.items(), key=lambda kv: -kv[1][1])[:15]:
        if " @ " in k:
            continue
        print(f"  {dd/1e3:8.1f} ms n={c:5d} {k}")
    print("by op@source (top 25):")
    shown = 0
    for k, (c, dd) in sorted(srcs.items(), key=lambda kv: -kv[1][1]):
        if " @ " not in k:
            continue
        print(f"  {dd/1e3:8.1f} ms n={c:5d} {k}")
        shown += 1
        if shown >= 25:
            break


if __name__ == "__main__":
    main()
