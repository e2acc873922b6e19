"""Single-frame depth eval against exported gt_depths.npz
(evaluate_depth.py:130-239 parity), with `--ext_disp_to_eval` npy mode
and the hamlyn/c3vd frame-eval splits."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.data import C3VDFrames, HamlynFrames, ScaredFrames, readlines
from endodav_tpu.eval import engine
from endodav_tpu.eval import metrics as M
from endodav_tpu.geometry import disp_to_depth
from endodav_tpu.ops.resize import resize2d
from endodav_tpu.options import EndoDAVOptions

HEADER = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def evaluate(opt):
    max_depth = 100.0 if opt.eval_split == "c3vd" else 150.0

    # gather (image, gt) pairs
    if opt.eval_split in ("endovis", "scared_video"):
        filenames = readlines(os.path.join(engine.SPLITS_DIR, "endovis", "test_files.txt"))
        dataset = ScaredFrames(opt.data_path, filenames, opt.height, opt.width, frame_idxs=(0,))
        gt_path = os.path.join(engine.SPLITS_DIR, "endovis", "gt_depths.npz")
        gt_depths = np.load(gt_path, fix_imports=True, encoding="latin1")["data"] if os.path.exists(gt_path) else None
    elif opt.eval_split == "hamlyn":
        dataset = HamlynFrames(opt.data_path, opt.height, opt.width)
        gt_depths = None
    elif opt.eval_split == "c3vd":
        dataset = C3VDFrames(opt.data_path, opt.height, opt.width)
        gt_depths = None
    else:
        raise ValueError(opt.eval_split)

    pred_disps = None
    if opt.ext_disp_to_eval:
        pred_disps = np.load(opt.ext_disp_to_eval)
    else:
        model, variables = engine.build_depth_model(opt)

        @jax.jit
        def fwd(img):
            return model.apply(variables, img)[("disp", 0)]

    import time

    # load items once, then run the model in fixed-size batches (the
    # reference loops one frame per forward, evaluate_depth.py:150-171)
    items = [dataset[i] for i in range(len(dataset))]
    times = []
    if pred_disps is None:
        batch_size = 8
        imgs = np.stack([it[("color", 0, 0)] for it in items], axis=0).astype(np.float32)
        n_real = len(imgs)
        blend = bool(getattr(opt, "post_process_blend", False))
        if opt.post_process or blend:
            # reference protocol (evaluate_depth.py:152-154): each image
            # gets a second, horizontally flipped forward pass.  NOTE: the
            # reference's Monodepth-v1 blend (batch_post_process_disparity,
            # evaluate_depth.py:35-47) is DEAD CODE — defined but never
            # called; `pred_disp[0]` keeps only the unflipped row, so the
            # reference's --post_process doubles compute without changing
            # metrics.  --post_process reproduces that exactly;
            # --post_process_blend (extension) applies the actual blend.
            imgs = np.concatenate([imgs, imgs[:, :, ::-1]], axis=0)
        pad = (-len(imgs)) % batch_size
        padded = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)], axis=0) if pad else imgs
        outs = []
        t0 = time.time()
        for c0 in range(0, len(padded), batch_size):
            outs.append(fwd(jnp.asarray(padded[c0 : c0 + batch_size])))
        model_disps = np.concatenate([np.asarray(o[..., 0]) for o in outs], axis=0)[: len(imgs)]
        times.append((time.time() - t0) / n_real * 1000)
        if opt.post_process or blend:
            l_disp = model_disps[:n_real]
            if blend:
                # Monodepth-v1 per-row blend (the reference's dead
                # batch_post_process_disparity, evaluate_depth.py:35-47)
                r_disp = model_disps[n_real:, :, ::-1]
                _, hh, ww = l_disp.shape
                m_disp = 0.5 * (l_disp + r_disp)
                ll, _ = np.meshgrid(np.linspace(0, 1, ww), np.linspace(0, 1, hh))
                l_mask = (1.0 - np.clip(20 * (ll - 0.05), 0, 1))[None]
                r_mask = l_mask[:, :, ::-1]
                model_disps = r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp
            else:
                model_disps = l_disp
    else:
        model_disps = None

    errors, ratios = [], []
    saved_disps = []
    for i, item in enumerate(items):
        # endovis uses the EXPORTED gt (scene_points at frame_id-1,
        # evaluate_depth.py:170-171); hamlyn/c3vd use the dataset's depth
        if gt_depths is not None:
            gt = gt_depths[i]
        elif "depth_gt" in item:
            gt = item["depth_gt"][..., 0]
        else:
            continue
        disp = pred_disps[i] if pred_disps is not None else model_disps[i]
        # the reference resizes with cv2.resize (INTER_LINEAR, half-pixel
        # sampling — NOT align_corners) before inverting
        # (evaluate_depth.py:182-184)
        disp = np.asarray(
            resize2d(jnp.asarray(disp[None, ..., None]), gt.shape[:2], "bilinear", align_corners=False)
        )[0, ..., 0]
        saved_disps.append(disp)
        if pred_disps is not None:
            # ext npy files hold ALREADY-SCALED disparity (the reference
            # inverts them directly, evaluate_depth.py:164-165,184)
            scaled = disp
        else:
            # model path: disp_to_depth's affine scaling commutes exactly
            # with the bilinear resize, so scaling after the resize equals
            # the reference's scale-then-resize (evaluate_depth.py:161-163)
            scaled, _ = disp_to_depth(disp, opt.min_depth, opt.max_depth)
            scaled = np.asarray(scaled)
        pred = 1.0 / scaled
        mask = (gt > 1e-3) & (gt < max_depth)
        if mask.sum() == 0:
            continue
        # scale factor applies BEFORE median scaling (evaluate_depth.py:204-210)
        pred = pred * opt.pred_depth_scale_factor
        if not opt.disable_median_scaling:
            ratio = np.median(gt[mask]) / np.median(pred[mask])
            ratios.append(ratio)
            pred = pred * ratio
        pred = np.clip(pred, 1e-3, max_depth)
        errors.append(M.compute_errors(gt, pred, mask))

    if opt.save_pred_disps and pred_disps is None and opt.load_weights_folder:
        # reference saves the raw disparity stack next to the weights
        out = os.path.join(os.path.expanduser(opt.load_weights_folder), "disps_{}_split.npy".format(opt.eval_split))
        np.save(out, np.array(saved_disps, dtype=object), allow_pickle=True)
        print(f"saved predicted disparities to {out}")

    if not errors:
        print("no valid frames: every gt mask was empty "
              f"(gt must contain values in (1e-3, {max_depth}))")
        return None
    errors = np.array(errors)
    mean_errors = errors.mean(0)
    engine.print_alignment_summary("scale", ratios)
    print(" | ".join(f"{n}={v:.4f}" for n, v in zip(HEADER, mean_errors)))
    # per-metric 95% CI row (evaluate_depth.py:225-231)
    engine.print_ci_row(errors)
    if times:
        print(f"average inference time: {np.mean(times):.2f} ms/frame")
    return mean_errors


def main():
    evaluate(EndoDAVOptions().parse())


if __name__ == "__main__":
    main()
