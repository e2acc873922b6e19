"""Data-parallel train-step scaling on the virtual CPU mesh.

Round-3 VERDICT task 8: the DP claim (trainer runs SPMD over a 'data'
mesh with replicated params + LoRA-only gradient all-reduce) had a
dryrun but no curve.  This tool runs the SAME global batch through the
full two-phase step at data=1/2/4/8 on a virtual CPU mesh
(`--xla_force_host_platform_device_count`) and reports

  * examples/s per mesh size (RELATIVE numbers only — this host has one
    physical core, so virtual devices time-share it; on real chips each
    mesh slice runs concurrently and the step time is the data=1 column
    divided by near-N),
  * the step-1 losses, asserted equal across mesh sizes (the global
    batch math is identical; only the all-reduce reassociation differs).

Usage:  python tools/bench_dp_scaling.py [--sizes 1,2,4,8] [--steps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}")
    import jax

    # the axon sitecustomize pins jax_platforms from the config side, so
    # the env var alone is ignored (verify SKILL.md gotcha)
    jax.config.update("jax_platforms", "cpu")
    return jax


def run_one(d: int, steps: int):
    import importlib

    import numpy as np

    ge = importlib.import_module("__graft_entry__")
    from endodav_tpu.train.trainer import Trainer

    opt = ge._TinyOpts()
    opt.batch_size = 8  # global batch, shards evenly at every d
    opt.T = 2
    opt.mesh_shape = f"data={d}"
    opt.log_dir = f"/tmp/endodav_dp_scaling_{d}"
    tr = Trainer(opt)
    rng = np.random.default_rng(0)
    batch = ge._tiny_batch(opt, rng)
    # warmup/compile
    s0 = tr.train_one_batch(dict(batch))
    loss1 = float(s0["loss"])
    t0 = time.time()
    for _ in range(steps):
        s = tr.train_one_batch(dict(batch))
    float(s["loss"])  # sync
    dt = (time.time() - t0) / steps
    return loss1, opt.batch_size / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]
    _force_cpu(max(sizes))

    import numpy as np

    rows = []
    for d in sizes:
        loss1, eps = run_one(d, args.steps)
        rows.append((d, loss1, eps))
        print(f"data={d}: step-1 loss {loss1:.6f}, {eps:.2f} examples/s "
              "(virtual mesh, one physical core — relative only)",
              flush=True)

    losses = np.array([r[1] for r in rows])
    spread = float(np.max(np.abs(losses - losses[0])))
    print(f"loss spread across mesh sizes: {spread:.2e}")
    if spread > 1e-4:
        print("FAIL: sharded step loss diverges from data=1", file=sys.stderr)
        return 1
    print("| data | step-1 loss | examples/s (1-core virtual mesh) |")
    print("|---|---|---|")
    for d, loss1, eps in rows:
        print(f"| {d} | {loss1:.6f} | {eps:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
