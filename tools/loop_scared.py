#!/usr/bin/env python
# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

"""Data sanity statistics for SCARED (tools/loop_scared.py parity):
per-sequence depth mean/std/min/max and frame counts."""

from __future__ import annotations

import argparse
import os

import numpy as np

from endodav_tpu.data.readers import list_frames, read_scared_depth


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--max_frames", type=int, default=20, help="frames sampled per sequence")
    args = p.parse_args()

    for split in ("train", "test"):
        root = os.path.join(args.data_path, split)
        if not os.path.isdir(root):
            continue
        for ds in sorted(os.listdir(root)):
            for kf in sorted(os.listdir(os.path.join(root, ds))):
                kd = os.path.join(root, ds, kf)
                paths = list_frames(kd)
                n = len(paths["left"])
                if n == 0:
                    continue
                sample = paths["depth"][:: max(1, n // args.max_frames)][: args.max_frames]
                depths = np.stack([read_scared_depth(p) for p in sample]) if sample else None
                if depths is not None:
                    valid = depths[depths > 0]
                    print(
                        f"{split}/{ds}/{kf}: {n} frames | depth mean {valid.mean():.1f} "
                        f"std {valid.std():.1f} min {valid.min():.1f} max {valid.max():.1f}"
                    )
                else:
                    print(f"{split}/{ds}/{kf}: {n} frames | no depth")


if __name__ == "__main__":
    main()
