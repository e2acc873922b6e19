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
        forward = engine.depth_window_forward(model, variables, opt.model_type)

    save_folder = None
    if opt.visualize_depth and opt.load_weights_folder:
        save_folder = os.path.join(os.path.expanduser(opt.load_weights_folder), "eval", opt.eval_split)
    result = engine.evaluate_video_sequences(opt, sequences, forward, with_temporal=False, save_folder=save_folder)
    # alignment summary + per-metric CI rows
    # (evaluate_depth_video_hamlyn.py:228-258)
    if opt.depth_align == "scale" and result["ratios"]:
        med = np.median(result["ratios"])
        print(f" Scaling ratios | med: {med:.3f} | std: {np.std(result['ratios'] / med):.3f}")
    elif result["align_stats"]:
        a = np.array(result["align_stats"], dtype=np.float64)
        print(" Aligning shift and scale | t_gt: {:.3f} | s_gt: {:.3f} | "
              "t_pred: {:.3f} | s_pred: {:.3f}".format(*a.mean(axis=0)))
    vals = list(result["mean_errors"])
    print(" | ".join(f"{n}={v:.4f}" for n, v in zip(HEADER, vals)))
    errs = result["all_errors"]
    if len(errs):
        cls = [engine.confidence_interval_95(errs[:, i]) for i in range(len(HEADER))]
        print("cls: " + " ".join(f"[{lo:.4f}, {hi:.4f}]" for lo, hi in cls))
    if result["mean_infer_ms"] is not None:
        print(f"average inference time: {result['mean_infer_ms']:.2f} ms/frame")
    return result


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
