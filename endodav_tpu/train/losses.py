"""Self-supervised training losses as pure functions.

Functional re-design of the Trainer loss pipeline
(trainer_end_to_end_video.py): `position_phase` covers
predict_poses_0/compute_losses_0 (:630-724), `main_phase` covers
process_batch/predict_poses/generate_images_pred/compute_losses
(:726-971), and `validation_ncc` the NCC val loss (:1010-1037).

Gradient partitioning replaces `requires_grad` flipping: phase 0
differentiates w.r.t. position-net params only, the main phase w.r.t.
the main group only — so no stop_gradient is needed around whole
networks, just the explicit `.detach()` sites of the reference
(occlusion masks, refined targets, registrations).

Known reference quirk kept for parity: temporal depth-consistency terms
index the flattened [B*T] batch with [1:]/[:-1] (trainer:871-898), which
pairs the last frame of clip b with the first frame of clip b+1.

All tensors channels-last; batch dict uses the reference's tuple keys.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from endodav_tpu.geometry import (
    backproject_depth,
    disp_to_depth,
    ncc,
    project_3d,
    reprojection_loss,
    rigid_flow,
    smooth_bright,
    smooth_loss,
    transformation_from_parameters,
)
from endodav_tpu.ops import flow_consistency, flow_warp, grid_sample, occlusion_mask_backward
from endodav_tpu.ops.resize import resize2d

__all__ = ["forward_flow_nets", "position_phase_loss", "main_phase", "validation_ncc"]

FRAME_IDS = (0, -1, 1)


def _apply(mod, variables, *args, train=False, **kw):
    """Apply a flax module; returns (out, new_batch_stats or None)."""
    if train and "batch_stats" in variables:
        out, mut = mod.apply(variables, *args, train=True, mutable=["batch_stats"], **kw)
        return out, mut["batch_stats"]
    if "batch_stats" in variables:
        return mod.apply(variables, *args, train=False, **kw), None
    return mod.apply({"params": variables["params"]}, *args, **kw), None


def forward_flow_nets(mods, variables, batch, scales, hw, train_position: bool, train_transform: bool):
    """Position + occlusion + transform forward for both source frames.

    Mirrors predict_poses_0 / the flow half of predict_poses
    (trainer:642-695, 741-787).  Returns (outputs, new_batch_stats dict).
    """
    H, W = hw
    out: dict[Any, jnp.ndarray] = {}
    new_stats = {}
    for f_i in (-1, 1):
        fwd_in = jnp.concatenate([batch[("color_aug", f_i, 0)], batch[("color_aug", 0, 0)]], axis=-1)
        rev_in = jnp.concatenate([batch[("color_aug", 0, 0)], batch[("color_aug", f_i, 0)]], axis=-1)
        feats_f, bs = _apply(mods["position_encoder"], variables["position_encoder"], fwd_in, train=train_position)
        if bs is not None:
            new_stats["position_encoder"] = bs
        feats_r, bs = _apply(mods["position_encoder"], variables["position_encoder"], rev_in, train=train_position)
        if bs is not None:
            new_stats["position_encoder"] = bs
        pos_f, _ = _apply(mods["position"], variables["position"], feats_f)
        pos_r, _ = _apply(mods["position"], variables["position"], feats_r)

        for s in scales:
            out[("position", s, f_i)] = pos_f[("position", s)]
            hi = resize2d(pos_f[("position", s)], (H, W), "bilinear", align_corners=True)
            out[("position", "high", s, f_i)] = hi
            out[("registration", s, f_i)] = flow_warp(batch[("color", f_i, 0)], hi)

            out[("position_reverse", s, f_i)] = pos_r[("position", s)]
            hi_r = resize2d(pos_r[("position", s)], (H, W), "bilinear", align_corners=True)
            out[("position_reverse", "high", s, f_i)] = hi_r
            mask, occ_map = occlusion_mask_backward(hi_r)
            out[("occu_mask_backward", s, f_i)] = mask
            out[("occu_map_backward", s, f_i)] = occ_map
            out[("occu_map_bidirection", s, f_i)] = flow_consistency(hi, hi_r)

        t_in = jnp.concatenate([out[("registration", 0, f_i)], batch[("color", 0, 0)]], axis=-1)
        t_feats, bs = _apply(mods["transform_encoder"], variables["transform_encoder"], t_in, train=train_transform)
        if bs is not None:
            new_stats["transform_encoder"] = bs
        trans, _ = _apply(mods["transform"], variables["transform"], t_feats)
        for s in scales:
            out[("transform", s, f_i)] = trans[("transform", s)]
            hi = resize2d(trans[("transform", s)], (H, W), "bilinear", align_corners=True)
            out[("transform", "high", s, f_i)] = hi
            refined = hi * jax.lax.stop_gradient(out[("occu_mask_backward", 0, f_i)]) + batch[("color", 0, 0)]
            out[("refined", s, f_i)] = jnp.clip(refined, 0.0, 1.0)
    return out, new_stats


def position_phase_loss(outputs, batch, scales, position_smoothness: float, use_ssim: bool = True):
    """compute_losses_0 (trainer:697-724)."""
    total = 0.0
    for s in scales:
        color = batch[("color", 0, s)]
        loss_smooth = 0.0
        loss_reg = 0.0
        for f_i in (-1, 1):
            occu = jax.lax.stop_gradient(outputs[("occu_mask_backward", 0, f_i)])
            loss_smooth += smooth_loss(outputs[("position", s, f_i)], color)
            rep = reprojection_loss(
                outputs[("registration", s, f_i)],
                jax.lax.stop_gradient(outputs[("refined", s, f_i)]),
                use_ssim,
            )
            loss_reg += (rep * occu).sum() / occu.sum()
        total += loss_reg / 2.0 + position_smoothness * (loss_smooth / 2.0) / (2 ** s)
    return total / len(scales)


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def main_phase(mods, variables, batch, cfg, temporal_weight=1.0, dash_phase2: bool = False):
    """Depth + pose forward, image synthesis, and the full loss.

    cfg: dict with scales, height, width, T, batch_size, min/max_depth,
    loss weights, learn_intrinsics, no_ssim, train flags.
    Returns (loss, aux) where aux carries per-term losses, outputs for
    logging, and updated batch_stats.
    """
    scales = cfg["scales"]
    H, W = cfg["height"], cfg["width"]
    use_ssim = not cfg["no_ssim"]

    outputs, new_stats = forward_flow_nets(
        mods, variables, batch, scales, (H, W),
        train_position=False, train_transform=cfg["train"],
    )

    # depth forward on the video tensor (trainer:731)
    video = batch[("color_aug", 0, 0)].reshape(cfg["batch_size"], cfg["T"], H, W, 3)
    disp_out, _ = _apply(
        mods["depth_model"], variables["depth_model"], video,
        **{"train": cfg["train"], "dash_phase2": dash_phase2},
    )
    for s in scales:
        outputs[("disp", s)] = disp_out[("disp", s)]

    # pose + learned intrinsics (trainer:790-804)
    for f_i in (-1, 1):
        pose_in = jnp.concatenate([batch[("color_aug", f_i, 0)], batch[("color_aug", 0, 0)]], axis=-1)
        pfeats, bs = _apply(mods["pose_encoder"], variables["pose_encoder"], pose_in, train=cfg["train"])
        if bs is not None:
            new_stats["pose_encoder"] = bs
        (axisangle, translation, mid), _ = _apply(mods["pose"], variables["pose"], [pfeats[-1]])
        if cfg["learn_intrinsics"]:
            cam_K, _ = _apply(mods["intrinsics_head"], variables["intrinsics_head"], mid, W, H)
            # 4x4 inverse needs f32 (XLA LU is f32-only; precision matters anyway)
            cam_K = cam_K.astype(jnp.float32)
            outputs[("K", 0)] = cam_K
            outputs[("inv_K", 0)] = jnp.linalg.inv(cam_K)
        outputs[("axisangle", 0, f_i)] = axisangle
        outputs[("translation", 0, f_i)] = translation
        outputs[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
            axisangle[:, 0, 0], translation[:, 0, 0]
        )

    if cfg["learn_intrinsics"]:
        cam_K, inv_K = outputs[("K", 0)], outputs[("inv_K", 0)]
    else:
        cam_K, inv_K = batch[("K", 0)], batch[("inv_K", 0)]

    # image synthesis + temporal depth errors (trainer:808-898)
    for s in scales:
        disp = outputs[("disp", s)]
        disp_full = resize2d(disp, (H, W), "bilinear", align_corners=True)
        _, depth = disp_to_depth(disp_full, cfg["min_depth"], cfg["max_depth"])
        outputs[("depth", 0, s)] = depth
        points = backproject_depth(depth, inv_K)
        for f_i in (-1, 1):
            T_mat = outputs[("cam_T_cam", 0, f_i)]
            pix, src_depths = project_3d(points, cam_K, T_mat, H, W)
            outputs[("sample", f_i, s)] = pix
            outputs[("color", f_i, s)] = grid_sample(
                batch[("color", f_i, 0)], pix, padding_mode="border", align_corners=True
            )
            outputs[("position_depth", s, f_i)] = rigid_flow(points, cam_K, T_mat, H, W)

            # cross-frame depth reprojection error (trainer:871-885)
            if f_i == 1:
                tgt_depth, src_coords = depth[1:], pix[:-1]
                src_depth = src_depths[:-1].reshape(tgt_depth.shape)
            else:
                tgt_depth, src_coords = depth[:-1], pix[1:]
                src_depth = src_depths[1:].reshape(tgt_depth.shape)
            sampled = grid_sample(tgt_depth, src_coords, padding_mode="zeros", align_corners=True)
            outputs[("reproj_depth_error", s, f_i)] = _masked_mean(
                jnp.abs(src_depth - sampled), sampled > 1e-3
            )

            # flow-warped depth error (trainer:887-898)
            if f_i == 1:
                origin, flow_map, fwd = depth[:-1], outputs[("position", "high", s, f_i)][:-1], depth[1:]
            else:
                origin, flow_map, fwd = depth[1:], outputs[("position", "high", s, f_i)][1:], depth[:-1]
            warp_depth = flow_warp(origin, flow_map, padding_mode="zeros")
            outputs[("flow_depth_error", s, f_i)] = _masked_mean(
                jnp.abs(warp_depth - fwd), warp_depth > 1e-3
            )

    # losses (trainer:913-971); temporal_weight gates the
    # depth-consistency terms (trainer:950, 1 when tuning temporal LoRA)
    losses = {}
    total = 0.0
    for s in scales:
        color = batch[("color", 0, s)]
        disp = outputs[("disp", s)]
        if disp.shape[1:3] != color.shape[1:3]:
            disp = resize2d(disp, color.shape[1:3], "bilinear", align_corners=True)

        l_rep = l_trans = l_cvt = l_dr = l_df = 0.0
        for f_i in (-1, 1):
            occu = jax.lax.stop_gradient(outputs[("occu_mask_backward", 0, f_i)])
            l_rep += (
                reprojection_loss(outputs[("color", f_i, s)], outputs[("refined", s, f_i)], use_ssim) * occu
            ).sum() / occu.sum()
            l_trans += (
                jnp.abs(
                    outputs[("refined", s, f_i)] - jax.lax.stop_gradient(outputs[("registration", 0, f_i)])
                ).mean(-1, keepdims=True)
                * occu
            ).sum() / occu.sum()
            l_cvt += smooth_bright(
                outputs[("transform", "high", s, f_i)],
                batch[("color", 0, 0)],
                jax.lax.stop_gradient(outputs[("registration", s, f_i)]),
                occu,
            )
            l_dr += outputs[("reproj_depth_error", s, f_i)]
            l_df += outputs[("flow_depth_error", s, f_i)]

        mean_disp = disp.mean(axis=(1, 2), keepdims=True)
        l_smooth = smooth_loss(disp / (mean_disp + 1e-7), color)

        l_rep = l_rep / 2.0
        l_trans = cfg["transform_constraint"] * l_trans / 2.0
        l_cvt = cfg["transform_smoothness"] * l_cvt / 2.0
        l_smooth = cfg["disparity_smoothness"] * l_smooth / (2 ** s)
        l_dr = temporal_weight * cfg["depth_reproj"] * l_dr / 2.0
        l_df = temporal_weight * cfg["depth_flow"] * l_df / 2.0
        scale_loss = l_rep + l_trans + l_cvt + l_smooth + l_dr + l_df
        total += scale_loss
        losses[f"loss/{s}"] = scale_loss
        losses[f"loss/loss_reprojection/{s}"] = l_rep
        losses[f"loss/loss_transform/{s}"] = l_trans
        losses[f"loss/loss_cvt/{s}"] = l_cvt
        losses[f"loss/loss_smooth/{s}"] = l_smooth
        losses[f"loss/loss_depth_reproj/{s}"] = l_dr
        losses[f"loss/loss_depth_flow/{s}"] = l_df

    total = total / len(scales)
    losses["loss"] = total
    return total, {"losses": losses, "outputs": outputs, "batch_stats": new_stats}


def validation_ncc(outputs, batch, scales):
    """NCC validation score (trainer:1010-1037); lower (more negative) is
    better registration, returned negated like the reference."""
    target = batch[("color", 0, 0)].mean(axis=-1, keepdims=True)
    total = 0.0
    for s in scales:
        regs = [
            ncc(outputs[("registration", s, f_i)].mean(axis=-1, keepdims=True), target)
            for f_i in (-1, 1)
        ]
        stacked = jnp.concatenate(regs, axis=-1)
        total += stacked.min(axis=-1).mean()
    return -(total / len(scales))
