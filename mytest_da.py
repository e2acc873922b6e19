#!/usr/bin/env python
"""Zero-shot Depth-Anything baseline scorer (mytest_da.py parity).

Scores a HuggingFace `DepthAnything` (torch CPU) zero-shot on the SCARED
video split with disparity-domain shift/scale alignment, as a reference
point against the fine-tuned models.  Requires the HF weights locally
(`--hf_model` path); degrades to a clear message in zero-egress setups.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--hf_model", default="depth-anything/Depth-Anything-V2-Small-hf",
                   help="HF id or local path of a depth-estimation model")
    p.add_argument("--eval_split", default="scared_video")
    p.add_argument("--input_size", type=int, default=518)
    args = p.parse_args()

    try:
        import torch
        from transformers import AutoImageProcessor, AutoModelForDepthEstimation

        processor = AutoImageProcessor.from_pretrained(args.hf_model)
        model = AutoModelForDepthEstimation.from_pretrained(args.hf_model)
        model.eval()
    except Exception as e:
        raise SystemExit(
            f"could not load baseline model '{args.hf_model}': {e}\n"
            "download the weights locally and pass --hf_model <path>."
        )

    from endodav_tpu.data import ScaredVideos, readlines
    from endodav_tpu.eval import metrics as M
    from endodav_tpu.eval.engine import SPLITS_DIR

    filenames = readlines(os.path.join(SPLITS_DIR, args.eval_split, "val_files.txt"))
    errors = []
    for data in ScaredVideos(args.data_path, filenames):
        preds = []
        for frame in data["colors"]:
            inputs = processor(images=frame, return_tensors="pt")
            with torch.no_grad():
                disp = model(**inputs).predicted_depth[0].numpy()
            import cv2

            disp = cv2.resize(disp, (frame.shape[1], frame.shape[0]))
            preds.append(disp)
        preds = np.stack(preds)
        gts = data["depths"]
        # disparity-domain shift/scale alignment (mytest_da.py:104-245)
        valid = (gts > 1e-3) & (gts < 150.0)
        gt_disp = 1.0 / np.clip(gts, 1e-3, None)
        s, t = M.compute_scale_and_shift(preds[valid], gt_disp[valid])
        depth = 1.0 / np.clip(preds * s + t, 1e-6, None)
        for i in range(len(gts)):
            errors.append(M.compute_errors(gts[i], np.clip(depth[i], 1e-3, 150.0), valid[i]))
        print(f"{data['filename']}: abs_rel={np.array(errors)[-len(gts):, 0].mean():.4f}")
    mean = np.array(errors).mean(0)
    names = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
    print(" | ".join(f"{n}={v:.4f}" for n, v in zip(names, mean)))


if __name__ == "__main__":
    main()
