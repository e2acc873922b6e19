"""Hamlyn full-sequence video depth benchmark
(evaluate_depth_video_hamlyn.py parity): no poses => no TAE/TAS; also the
`--pred_root` npy re-eval mode for scoring pre-saved depth dirs."""

from __future__ import annotations

import os

import numpy as np

from endodav_tpu.data import HamlynVideos, readlines
from endodav_tpu.eval import engine
from endodav_tpu.options import EndoDAVOptions

HEADER = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def evaluate(opt):
    split_file = os.path.join(engine.SPLITS_DIR, "hamlyn_video", "val_files_all.txt")
    filenames = readlines(split_file)
    sequences = HamlynVideos(opt.data_path, filenames, pred_root=opt.pred_root,
                             max_length=opt.max_length)

    forward = None
    if opt.pred_root is None:
        model, variables = engine.build_depth_model(opt)
        forward = engine.depth_window_forward(model, variables, opt.model_type, opt)

    save_folder = None
    if opt.visualize_depth and opt.load_weights_folder:
        save_folder = os.path.join(os.path.expanduser(opt.load_weights_folder), "eval", opt.eval_split)
    result = engine.evaluate_video_sequences(opt, sequences, forward, with_temporal=False, save_folder=save_folder)
    # alignment summary + per-metric CI rows
    # (evaluate_depth_video_hamlyn.py:228-258)
    engine.print_alignment_summary(opt.depth_align, result["ratios"],
                                   result["align_stats"])
    vals = list(result["mean_errors"])
    print(" | ".join(f"{n}={v:.4f}" for n, v in zip(HEADER, vals)))
    engine.print_ci_row(result["all_errors"])
    if result["mean_infer_ms"] is not None:
        print(f"average inference time: {result['mean_infer_ms']:.2f} ms/frame")
    return result


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
