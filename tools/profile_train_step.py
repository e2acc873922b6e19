"""Device-side ground-truth profile of the full two-phase train step.

Reuses bench_train_ablation's reference config (B=1, T=16, 256x320,
vits @ 224x280, dvlora, bf16) and reports per-op-category device totals
— the trustworthy timing path in this environment (PERFORMANCE.md).

Run: python tools/profile_train_step.py [--steps 2]
Env: ENDODAV_NO_WARP_MM=1 to profile the XLA gather/scatter warps.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

from tools.bench_train_ablation import Opts, make_batches  # noqa: E402
from tools.profile_device import device_profile  # noqa: E402


CATEGORIES = (
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("conv", ("conv",)),
    ("matmul/dot", ("dot", "fusion.matmul")),
    ("pallas", ("warp", "splat", "attn", "fused", "pl_")),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25,
                    help="rows to print in the top-ops table")
    ap.add_argument("--dump", default="",
                    help="write every device row as JSON to this path")
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"],
                    help="vitl needs ENDODAV_SCAN_TRUNK=1: the unrolled "
                         "24-block train-step lowering exceeds the "
                         "remote-compile service (PERFORMANCE.md 'vitl')")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.train.trainer import Trainer, _flatten_bt

    opt = Opts()
    opt.encoder = args.encoder
    opt.log_dir = tempfile.mkdtemp()
    tr = Trainer(opt)
    rng = np.random.default_rng(0)
    host_batches = make_batches(opt, args.steps + 1, rng)
    dev_batches = [jax.device_put(_flatten_bt(b)) for b in host_batches]
    device_sync(dev_batches)

    step_fn = tr._step_fn if hasattr(tr, "_step_fn") else tr._build_step(False)
    state = [tr.variables, tr.opt_state, tr.opt_state_0]

    def one(batch):
        v, s1, s0, scalars, _ = step_fn(
            state[0], state[1], state[2], dict(batch),
            jnp.asarray(0), jnp.asarray(1e-4), jnp.asarray(1e-4))
        state[0], state[1], state[2] = v, s1, s0
        return scalars["loss_0"], scalars["loss"]

    print("compiling/warmup...", flush=True)
    device_sync(one(dev_batches[0]))

    step_losses = []

    def run():
        outs = [one(b) for b in dev_batches[1:]]
        step_losses.extend(outs)
        return outs

    # top=None: the total must sum EVERY device row — a truncated list
    # understates it and skews the category percentages.
    rows = device_profile(run, top=None)
    if args.dump:
        import json

        with open(args.dump, "w") as f:
            json.dump(rows, f)
    total = sum(ms for name, n, ms in rows
                if not name.startswith("jit_") and not name.isdigit())
    # exact-format loss lines consumed by tools/bench_warp_windows.py's
    # cross-mode agreement check (the warp window modes are exact, so
    # any drift between modes is a bug)
    for i, (l0, l) in enumerate(step_losses):
        print(f"step {i}: loss_0={float(l0):.9f} loss={float(l):.9f}")
    print(f"\ndevice total over {args.steps} steps: {total:.0f} ms "
          f"({total/args.steps:.0f} ms/step)")
    cat_sum = {}
    for name, n, ms in rows:
        if name.startswith("jit_") or name.isdigit():
            continue
        low = name.lower()
        for cat, keys in CATEGORIES:
            if any(k in low for k in keys):
                cat_sum[cat] = cat_sum.get(cat, 0.0) + ms
                break
        else:
            cat_sum["other"] = cat_sum.get("other", 0.0) + ms
    for cat, ms in sorted(cat_sum.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {ms/args.steps:8.0f} ms/step  ({100*ms/total:.0f}%)")
    print("\ntop ops:")
    for name, n, ms in rows[:args.top]:
        if not name.startswith("jit_") and not name.isdigit():
            print(f"  {name[:70]:70s} n={n:5d} {ms/args.steps:8.1f} ms/step")


if __name__ == "__main__":
    main()
