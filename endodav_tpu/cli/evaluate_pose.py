"""Odometry benchmark on the endovis pose sequences
(evaluate_pose.py:73-239 parity): pairwise PoseDecoder over
test_files_sequence{1,2}, trajectory accumulation, ATE/RE on 5-frame
tracks with 95% CI, intrinsics stats, pose_eval.txt append + predicted
pose npz dumps for visualize_pose."""

from __future__ import annotations

import os

import numpy as np

from endodav_tpu.data import ScaredFrames, readlines
from endodav_tpu.eval import engine
from endodav_tpu.options import EndoDAVOptions


def _sequence_pairs(opt, filenames):
    ds = ScaredFrames(opt.data_path, filenames, opt.height, opt.width, frame_idxs=(0, 1))
    pairs = []
    for i in range(len(ds)):
        item = ds[i]
        pairs.append(np.concatenate([item[("color", 1, 0)], item[("color", 0, 0)]], axis=-1))
    return np.stack(pairs)


def evaluate(opt, split: str = "endovis"):
    results = {}
    all_intr = []
    out_lines = []
    for seq in (1, 2):
        split_path = os.path.join(engine.SPLITS_DIR, split, f"test_files_sequence{seq}.txt")
        if not os.path.exists(split_path):
            split_path = os.path.join(engine.SPLITS_DIR, "endovis_old", f"test_files_sequence{seq}.txt")
        filenames = readlines(split_path)
        gt_path = os.path.join(engine.SPLITS_DIR, split, "curve", f"gt_poses_sequence{seq}.npz")
        if not os.path.exists(gt_path):
            gt_path = os.path.join(engine.SPLITS_DIR, "endovis_old", "curve", f"gt_poses_sequence{seq}.npz")
        if not os.path.exists(gt_path):
            print(f"[evaluate_pose] missing GT poses {gt_path}; run export_gt_pose first")
            continue
        gt_local = np.load(gt_path, fix_imports=True, encoding="latin1")["data"]
        pairs = _sequence_pairs(opt, filenames)
        # evaluate_pose.py:183-190: gt_count-1 track windows
        res = engine.evaluate_pose_pairs(opt, gt_local, pairs,
                                         num_tracks=gt_local.shape[0] - 1)
        results[seq] = res
        all_intr.append(res["pred_intrinsics"])
        out_dir = os.path.join(engine.SPLITS_DIR, split, "curve")
        os.makedirs(out_dir, exist_ok=True)
        np.savez_compressed(os.path.join(out_dir, f"pred_poses_sequence{seq}.npz"), data=res["pred_poses"])
        out_lines.append(
            f"sq{seq} Trajectory error: {res['ate_mean']:.4f}, std: {res['ate_std']:.4f}, "
            f"95% cls: [{res['ate_ci'][0]:.4f}, {res['ate_ci'][1]:.4f}]"
        )
        out_lines.append(f"sq{seq} Rotation error: {res['re_mean']:.4f}, std: {res['re_std']:.4f}")

    for line in out_lines:
        print(line)
    if opt.learn_intrinsics and all_intr:
        intr = np.concatenate(all_intr, axis=0)
        for label, row, col, norm in (("fx", 0, 0, opt.width), ("fy", 1, 1, opt.height),
                                      ("cx", 0, 2, opt.width), ("cy", 1, 2, opt.height)):
            print(f"{label}: {intr[:, row, col].mean() / norm:.4f}, std: {intr[:, row, col].std() / norm:.4f}")
    if opt.load_weights_folder:
        with open(os.path.join(os.path.expanduser(opt.load_weights_folder), "pose_eval.txt"), "a") as f:
            f.write("\n".join(out_lines) + "\n")
    return results


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
