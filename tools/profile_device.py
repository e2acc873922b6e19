"""Device-time profiling helpers (the trustworthy timing path).

Wall-clock timing of individually dispatched computations through this
environment's relay is unreliable in both directions (PERFORMANCE.md
"Kernels" caveat).  `jax.profiler.trace` DOES capture real device-side
executable durations here, so tools use this module to run a callable
under a trace and report per-executable device totals.

Usage:
    from tools.profile_device import device_profile
    rows = device_profile(lambda: run_steps(), runs_label="jit_step_fn")
"""

from __future__ import annotations


def _sync(tree):
    """Scalar-index fetch of the last leaf: block_until_ready returns
    early on a saturated axon relay (endodav_tpu/utils/devsync.py), and
    an early return here would stop the profiler before the device
    finished, truncating the trace."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(tree)[-1]
    if not hasattr(leaf, "ndim"):
        return leaf
    return np.asarray(leaf[(0,) * leaf.ndim])


import glob
import gzip
import json
import os
import tempfile


def _load_trace(logdir: str) -> list[dict]:
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    events: list[dict] = []
    for p in paths:
        with gzip.open(p) as f:
            events.extend(json.load(f).get("traceEvents", []))
    return events


def device_pids(events: list[dict]) -> set[int]:
    pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            pids.add(e.get("pid"))
    return pids


def device_profile(fn, top: int | None = 20) -> list[tuple[str, int, float]]:
    """Run ``fn()`` under a profiler trace; return [(name, count, total_ms)]
    for device-side complete events, sorted by total duration.
    ``top=None`` returns every row — required when the caller sums rows
    into a total (a truncated list understates it)."""
    import jax

    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            out = fn()
            _sync(out)
        events = _load_trace(d)
    pids = device_pids(events)
    agg: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in pids:
            agg.setdefault(e.get("name", "?"), []).append(e.get("dur", 0.0))
    rows = [(n, len(ds), sum(ds) / 1e3) for n, ds in agg.items()]
    rows.sort(key=lambda r: -r[2])
    return rows if top is None else rows[:top]


def main():
    """Self-test: profile a known matmul and print device MFU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((4096, 4096)) * 0.01,
                    jnp.bfloat16)
    f = jax.jit(lambda x: x @ w)
    _sync(f(a))

    def run():
        x = a
        for _ in range(5):
            x = f(x)
        return x

    rows = device_profile(run)
    for name, n, ms in rows:
        print(f"{name}: n={n} total={ms:.2f} ms")
    for name, n, ms in rows:
        if name.startswith("jit_"):
            per = ms / n / 1e3
            print(f"-> {per*1e6:.0f} us/matmul, "
                  f"{2 * 4096**3 / per / 1e12:.0f} TFLOP/s")
            break


if __name__ == "__main__":
    main()
