"""Video depth benchmark on SCARED (evaluate_depth_video.py parity).

Build the video model from flags, run batched sliding-window inference
per sequence, align (scale or scale_shift), report per-frame depth
errors + TAE/TAS with 95% CI and mean inference time, append results.txt.
"""

from __future__ import annotations

import os

import numpy as np

from endodav_tpu.data import ScaredVideos, readlines
from endodav_tpu.eval import engine
from endodav_tpu.options import EndoDAVOptions

HEADER = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3", "tae", "tas")


def evaluate(opt):
    split_file = os.path.join(engine.SPLITS_DIR, opt.eval_split, "val_files.txt")
    filenames = readlines(split_file)
    sequences = ScaredVideos(opt.data_path, filenames, pred_root=opt.pred_root)

    forward = None
    if opt.pred_root is None:
        model, variables = engine.build_depth_model(opt)
        forward = engine.depth_window_forward(model, variables, opt.model_type, opt)

    save_folder = None
    if opt.visualize_depth and opt.load_weights_folder:
        save_folder = os.path.join(os.path.expanduser(opt.load_weights_folder), "eval", opt.eval_split)
    result = engine.evaluate_video_sequences(opt, sequences, forward, save_folder=save_folder)

    vals = list(result["mean_errors"])
    temporal = result["mean_temporal"] if result["mean_temporal"] is not None else [np.nan, np.nan]
    vals += list(temporal)
    line = " | ".join(f"{n}={v:.4f}" for n, v in zip(HEADER, vals))
    ci = result["ci"]
    print(line)
    print(f"abs_rel 95% CI: [{ci[0]:.4f}, {ci[1]:.4f}]")
    if result["mean_infer_ms"] is not None:
        print(f"average inference time: {result['mean_infer_ms']:.2f} ms/frame")
    if opt.load_weights_folder:
        out = os.path.join(os.path.dirname(os.path.expanduser(opt.load_weights_folder)), "results.txt")
        with open(out, "a") as f:
            f.write(line + "\n")
    return result


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
