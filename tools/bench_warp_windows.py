"""Whole-train-step A/B of the warp-kernel window modes (round 3).

Runs tools/profile_train_step.py's config under each env mode and also
checks the step losses agree across modes (the windows are exact — any
drift is a bug, not noise).  One command for the device session:

    python tools/bench_warp_windows.py [--steps 2] [--modes full,band,tile]

Modes (kernels/warp_matmul.py) — tile became the DEFAULT after the
round-3 device A/B (803 vs band 918 vs full 1243 ms/step):
    full  ENDODAV_WARP_NOBAND=1         unwindowed baseline
    band  ENDODAV_WARP_NOTILE=1         64-row banded contractions only
    tile  (default env)                 bands + tile-order lane windows
    band32/tile32                       same with ENDODAV_WARP_BAND=32

Each mode runs in a subprocess (the band size is read at import, and
separate processes keep the jit caches honest).

On the loss check: the per-kernel outputs are exact across modes
(device-probed bit-identical fwd+bwd at every train shape), but tile's
transposes change XLA's downstream bf16 fusion/reduction order, so
whole-step losses drift a few 1e-4 from full.  That drift was
investigated (this docstring is where it landed): band mode, which
equally changes kernel internals but not the XLA-side graph, matches
full at rtol 1e-5, isolating the drift to graph reassociation rather
than the window plan.  The check therefore holds full/band to 1e-5 and
tile modes to a 2e-3 budget, printing any above-1e-5 drift it absorbs.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

MODES = {
    "full": {"ENDODAV_WARP_NOBAND": "1"},
    "band": {"ENDODAV_WARP_NOTILE": "1"},
    "tile": {},
    "band32": {"ENDODAV_WARP_NOTILE": "1", "ENDODAV_WARP_BAND": "32"},
    "tile32": {"ENDODAV_WARP_BAND": "32"},
}


def run_mode(name: str, env_extra: dict, steps: int) -> dict:
    # start from an environment with NO warp flags: flags exported in the
    # calling shell would otherwise contaminate the other modes and
    # mislabel the A/B table
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("ENDODAV_WARP_")}
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, "-u", "tools/profile_train_step.py",
         "--steps", str(steps)],
        capture_output=True, text=True, env=env, cwd=".",
    )
    out = proc.stdout + proc.stderr
    ms = None
    m = re.search(r"\((\d+) ms/step\)", out)
    if m:
        ms = int(m.group(1))
    # "step i: loss_0=x loss=y" lines printed by profile_train_step.py
    losses = [tuple(float(v) for v in m)
              for m in re.findall(r"loss_0=([0-9.]+) loss=([0-9.]+)", out)]
    print(f"--- {name} ({env_extra or 'default env'}) ---")
    tail = [l for l in out.splitlines() if l.strip()][-16:]
    print("\n".join(tail))
    return {"mode": name, "ms_per_step": ms, "losses": losses,
            "rc": proc.returncode}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--modes", default="full,band,tile")
    args = ap.parse_args(argv)

    results = [run_mode(m, MODES[m], args.steps)
               for m in args.modes.split(",")]
    print("\n| mode | ms/step |")
    print("|---|---|")
    for r in results:
        print(f"| {r['mode']} | {r['ms_per_step']} |")
    bad = [r for r in results if r["rc"] != 0 or r["ms_per_step"] is None]

    # cross-mode loss agreement: the window modes are exact (trimmed
    # regions only ever contributed exact zeros), so per-step losses
    # must match across modes — drift beyond the budget means a
    # band/tile-plan bug.  Budgets: full/band share the surrounding XLA
    # graph, so they must agree to 1e-5; tile's pixel re-ordering adds
    # transposes that change XLA's downstream bf16 fusion/reduction
    # order, which moves whole-step losses a few 1e-4 even though the
    # kernels themselves are device-probed bit-identical (investigated,
    # see module docstring) — budget 2e-3, drift always printed.
    ref = next((r for r in results if r["losses"]), None)
    drift = False
    for r in results:
        if not r["losses"]:
            print(f"loss check: {r['mode']} produced NO loss lines")
            drift = True
            continue
        if r is ref:
            continue
        if len(r["losses"]) != len(ref["losses"]):
            print(f"loss check: {r['mode']} step count != {ref['mode']}")
            drift = True
            continue
        budget = 2e-3 if r["mode"].startswith("tile") or \
            ref["mode"].startswith("tile") else 1e-5
        for i, (a, b) in enumerate(zip(ref["losses"], r["losses"])):
            err = max(abs(x - y) / max(abs(x), 1e-9)
                      for x, y in zip(a, b))
            if err > budget:
                print(f"loss check: {r['mode']} step {i} drifts from "
                      f"{ref['mode']} by {err:.2e}  ({a} vs {b})")
                drift = True
            elif err > 1e-5:
                print(f"loss check: {r['mode']} step {i} bf16-reassoc "
                      f"drift {err:.2e} vs {ref['mode']} (within the "
                      "documented tile budget)")
    if ref is not None and not drift:
        print(f"loss check: all modes agree on {len(ref['losses'])} "
              "step losses (rtol 1e-5)")
    return 1 if bad or drift else 0


if __name__ == "__main__":
    sys.exit(main())
