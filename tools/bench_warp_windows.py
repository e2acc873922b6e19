"""Whole-train-step A/B of the warp-kernel window modes (round 3).

Runs tools/profile_train_step.py's config under each env mode and also
checks the step losses agree across modes (the windows are exact — any
drift is a bug, not noise).  One command for the device session:

    python tools/bench_warp_windows.py [--steps 2] [--modes full,band,tile]

Modes (kernels/warp_matmul.py):
    full  ENDODAV_WARP_NOBAND=1         round-3 baseline (769 ms/step)
    band  (default env)                 64-row banded contractions
    tile  ENDODAV_WARP_TILE=1           bands + tile-order lane windows
    band32/tile32                       same with ENDODAV_WARP_BAND=32

Each mode runs in a subprocess (the band size is read at import, and
separate processes keep the jit caches honest).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

MODES = {
    "full": {"ENDODAV_WARP_NOBAND": "1"},
    "band": {},
    "tile": {"ENDODAV_WARP_TILE": "1"},
    "band32": {"ENDODAV_WARP_BAND": "32"},
    "tile32": {"ENDODAV_WARP_TILE": "1", "ENDODAV_WARP_BAND": "32"},
}


def run_mode(name: str, env_extra: dict, steps: int) -> dict:
    env = dict(os.environ)
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
    losses = re.findall(r"loss[_ ]?0?[=:]\s*([0-9.]+)", out)
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
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
