"""Combined video depth + pose + intrinsics benchmark
(evaluate_depth_video_pose.py:120-357 parity): video depth with TAE/TAS
on the test split, per-sequence pairwise pose ATE/RE on 5-frame tracks,
and normalized intrinsics statistics."""

from __future__ import annotations

import os

import numpy as np

from endodav_tpu.data import ScaredVideos, readlines
from endodav_tpu.eval import engine
from endodav_tpu.options import EndoDAVOptions

HEADER = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3", "tae", "tas")


def evaluate(opt):
    split_file = os.path.join(engine.SPLITS_DIR, opt.eval_split, "test_files.txt")
    filenames = readlines(split_file)
    sequences = ScaredVideos(opt.data_path, filenames)

    model, variables = engine.build_depth_model(opt)
    forward = engine.depth_window_forward(model, variables, opt.model_type, opt)

    depth_result = engine.evaluate_video_sequences(opt, sequences, forward)
    # alignment summary (evaluate_depth_video_pose.py:322-333)
    engine.print_alignment_summary(opt.depth_align, depth_result["ratios"],
                                   depth_result["align_stats"])
    vals = list(depth_result["mean_errors"]) + list(
        depth_result["mean_temporal"] if depth_result["mean_temporal"] is not None else [np.nan] * 2
    )
    print(" | ".join(f"{n}={v:.4f}" for n, v in zip(HEADER, vals)))
    # 9-wide CI row: 7 depth + tae/tas (evaluate_depth_video_pose.py:328-349)
    engine.print_ci_row(depth_result["all_errors"], depth_result["all_temporal"])

    pose_results = []
    for data in sequences:
        colors = data["colors"].astype(np.float32) / 255.0
        # the reference feeds the pose network at the sequence's NATIVE
        # resolution here (evaluate_depth_video_pose.py:256-262 — no
        # resize, unlike evaluate_pose.py's 256x320 dataset pipeline);
        # opt.height/width only normalize the intrinsics stats
        pairs = np.concatenate([colors[1:], colors[:-1]], axis=-1)
        gt_local = []
        for i in range(len(data["poses"]) - 1):
            gt_local.append((data["poses"][i + 1] @ np.linalg.inv(data["poses"][i])).astype(np.float32))
        res = engine.evaluate_pose_pairs(opt, np.array(gt_local), pairs)
        pose_results.append(res)
        print(
            f"{data['filename']}: ATE {res['ate_mean']:.4f}±{res['ate_std']:.4f} "
            f"[{res['ate_ci'][0]:.4f}, {res['ate_ci'][1]:.4f}] | RE {res['re_mean']:.4f}±{res['re_std']:.4f}"
        )
        if opt.learn_intrinsics:
            st = res["intrinsics_stats"]
            print("  " + " ".join(f"{k}: {v[0]:.4f}±{v[1]:.4f}" for k, v in st.items()))
    return {"depth": depth_result, "pose": pose_results}


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
