"""Build a synthetic SCARED tree for end-to-end CLI drives.

Writes the sequences named by ``splits/scared_video/val_files.txt``
(reference layout: ``scared_video_dataset.py:31-75`` — per-sequence
``data/{left,right,scene_points,frame_data}`` with PNG frames, 3-channel
float TIFF scene_points, and per-frame ``camera-pose`` JSON) so the eval
and train CLIs run without real data.  Matches the writer fixture in
``tests/test_data.py::scared_tree``; the three scene_points channels are
distinct so channel-selection bugs stay visible.

Usage:  python tools/make_synth_scared.py --out /tmp/scared_synth
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SEQS = ["train/dataset5/keyframe1", "train/dataset3/keyframe3",
        "train/dataset4/keyframe3"]


def _train_seqs():
    """The scared_video train split (splits/scared_video/train_files.txt)
    — written by --full so train_end_to_end_video.py can run end-to-end."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "splits", "scared_video", "train_files.txt")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def build(root: str, h: int = 256, w: int = 320, n_frames: int = 40,
          seed: int = 17, seqs=None) -> None:
    import cv2

    rng = np.random.default_rng(seed)
    for seq in (seqs if seqs is not None else SEQS):
        base = os.path.join(root, seq, "data")
        for sub in ("left", "right", "scene_points", "frame_data"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(base, "left", f"{i:010d}.png"), img)
            cv2.imwrite(os.path.join(base, "right", f"{i:010d}.png"), img)
            depth = rng.uniform(20, 120, (h, w)).astype(np.float32)
            scene = np.stack(
                [depth, depth * 0.25 + 7.0, depth * -0.5 + 3.0], axis=-1)
            cv2.imwrite(
                os.path.join(base, "scene_points",
                             f"scene_points{i:06d}.tiff"), scene)
            pose = np.eye(4)
            pose[:3, 3] = rng.standard_normal(3) * 0.05
            with open(os.path.join(base, "frame_data",
                                   f"frame_data{i:06d}.json"), "w") as f:
                json.dump({"camera-pose": pose.tolist()}, f)
    print(f"synthetic SCARED tree at {root}: "
          f"{len(seqs if seqs is not None else SEQS)} sequences × "
          f"{n_frames} frames of {h}x{w}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scared_synth")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--full", action="store_true",
                    help="also write the 24 train-split sequences "
                         "(--train_frames each) so the train CLI runs")
    ap.add_argument("--train_frames", type=int, default=20)
    args = ap.parse_args(argv)
    build(args.out, args.height, args.width, args.frames)
    if args.full:
        build(args.out, args.height, args.width, args.train_frames,
              seed=31, seqs=_train_seqs())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
