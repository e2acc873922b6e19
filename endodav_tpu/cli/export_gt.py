"""GT export tools (export_gt_depth.py / export_gt_pose.py parity).

Packs SCARED GT depth tiffs (`scene_points*.tiff`, channel 0, rows
0:1024) into `splits/<split>/gt_depths.npz` and GT relative poses into
`splits/<split>/curve/gt_poses_sequence<N>.npz`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from endodav_tpu.data import readlines
from endodav_tpu.data.readers import read_pose_json, read_scared_depth
from endodav_tpu.eval.engine import SPLITS_DIR


def _split_prefix(folder: str) -> str:
    return "train" if int(folder[7]) < 8 else "test"


def export_gt_depth(data_path: str, split: str, useage: str = "eval"):
    """export_gt_depth.py parity: eval packs test_files.txt ->
    gt_depths.npz; 3d_recon packs 3d_reconstruction.txt ->
    gt_depths_recon.npz (:34-40).  The tiff index is the split line's
    frame_id MINUS ONE (:63 — endovis frame lines are 1-based relative
    to the scene_points numbering)."""
    if useage == "eval":
        lines = readlines(os.path.join(SPLITS_DIR, split, "test_files.txt"))
        out = os.path.join(SPLITS_DIR, split, "gt_depths.npz")
    else:
        lines = readlines(os.path.join(SPLITS_DIR, split, "3d_reconstruction.txt"))
        out = os.path.join(SPLITS_DIR, split, "gt_depths_recon.npz")
    gt_depths = []
    for line in lines:
        parts = line.split()
        folder, frame_index = parts[0], int(parts[1])
        path = os.path.join(data_path, _split_prefix(folder), folder, "data",
                            "scene_points", f"scene_points{frame_index - 1:06d}.tiff")
        gt_depths.append(read_scared_depth(path).astype(np.float32))
    np.savez_compressed(out, data=np.stack(gt_depths, axis=0))
    print(f"saved {len(gt_depths)} gt depths to {out}")


def export_gt_pose(data_path: str, split: str, sequence: int):
    lines = readlines(os.path.join(SPLITS_DIR, split, f"test_files_sequence{sequence}.txt"))
    # One relative pose PER SPLIT LINE, between frame_id-1 and frame_id:
    # T = P_{f} @ pinv(P_{f-1})  (export_gt_pose.py:38-57 — note this is
    # offset one frame from the pairs the pose network is evaluated on,
    # a reference-protocol quirk kept for parity).
    gt_local = []
    for line in lines:
        parts = line.split()
        folder, frame_index = parts[0], int(parts[1])

        def pose_at(f):
            p = os.path.join(data_path, _split_prefix(folder), folder, "data",
                             "frame_data", f"frame_data{f:06d}.json")
            return read_pose_json(p)

        p0, p1 = pose_at(frame_index - 1), pose_at(frame_index)
        gt_local.append((p1 @ np.linalg.pinv(p0)).astype(np.float32))
    out_dir = os.path.join(SPLITS_DIR, split, "curve")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"gt_poses_sequence{sequence}.npz")
    np.savez_compressed(out, data=np.array(gt_local))
    print(f"saved {len(gt_local)} relative poses to {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="endovis")
    p.add_argument("--what", choices=["depth", "pose", "both"], default="both")
    p.add_argument("--useage", choices=["eval", "3d_recon"], default="eval")
    p.add_argument("--sequences", nargs="*", type=int, default=[1, 2])
    args = p.parse_args()
    if args.what in ("depth", "both"):
        export_gt_depth(args.data_path, args.split, args.useage)
    if args.what in ("pose", "both"):
        for seq in args.sequences:
            export_gt_pose(args.data_path, args.split, seq)


if __name__ == "__main__":
    main()
