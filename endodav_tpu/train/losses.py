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
    smooth_bright,
    smooth_loss,
    transformation_from_parameters,
)
from endodav_tpu.ops import (flow_consistency, flow_to_grid, flow_warp,
                             grid_sample, occlusion_mask_backward)
from endodav_tpu.ops.resize import resize2d

__all__ = ["forward_flow_nets", "position_phase_loss", "main_phase", "validation_ncc"]

FRAME_IDS = (0, -1, 1)


def _stack_sf(out, key, scales):
    """Stack out[(key, "high", s, f_i)] over frames and scales onto the
    batch axis -> [2*B*n_s, H, W, C], ordered (f_i, batch, scale) with
    scale INNERMOST: grid element bi = (f*B + t)*n_s + s, so all scales
    of one (frame, clip-item) are consecutive — exactly the layout
    `grid_sample(..., img_tile=n_s)` wants for resident-image reuse."""
    parts = []
    for f_i in (-1, 1):
        stacked = jnp.stack([out[(key, "high", s, f_i)] for s in scales], axis=1)
        parts.append(stacked.reshape(-1, *stacked.shape[2:]))
    return jnp.concatenate(parts, axis=0)


def _unstack_sf(out, key, arr, scales):
    """Inverse of `_stack_sf`'s ordering: write out[(key, s, f_i)]."""
    n_s = len(scales)
    arr = arr.reshape(2, -1, n_s, *arr.shape[1:])
    for fi_idx, f_i in enumerate((-1, 1)):
        for s_idx, s in enumerate(scales):
            out[(key, s, f_i)] = arr[fi_idx, :, s_idx]


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
    n_s = len(scales)
    # NOTE: the per-scale flow upsamples stay SEPARATE resize2d calls —
    # batching the 4 same-shape resizes per scale into one call was
    # device-measured at 801/801 ms/step vs 749/740 without (the
    # concat/split layout passes outweigh the saved dispatches); the
    # batching was reverted (PERFORMANCE.md round 4).
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
            out[("position", "high", s, f_i)] = resize2d(
                pos_f[("position", s)], (H, W), "bilinear", align_corners=True)
            out[("position_reverse", s, f_i)] = pos_r[("position", s)]
            out[("position_reverse", "high", s, f_i)] = resize2d(
                pos_r[("position", s)], (H, W), "bilinear", align_corners=True)

    # Batched warps (round 4): every (scale, frame) pair warps at full
    # resolution, so the reference's 8-iteration warp loop collapses to
    # ONE kernel launch per warp kind — the registration warps share one
    # source image across scales (img_tile), and the splat / consistency
    # warps stack on the batch axis.  Per-element math is unchanged.
    his = _stack_sf(out, "position", scales)             # [2*B*n_s, H, W, 2]
    hirs = _stack_sf(out, "position_reverse", scales)
    src = jnp.concatenate([batch[("color", -1, 0)], batch[("color", 1, 0)]], axis=0)
    _unstack_sf(out, "registration",
                flow_warp(src, his, img_grad=False, img_tile=n_s), scales)
    masks, occ_maps = occlusion_mask_backward(hirs)
    _unstack_sf(out, "occu_mask_backward", masks, scales)
    _unstack_sf(out, "occu_map_backward", occ_maps, scales)
    _unstack_sf(out, "occu_map_bidirection", flow_consistency(his, hirs), scales)

    for f_i in (-1, 1):
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
    """compute_losses_0 (trainer:697-724).

    The full-res registration-reprojection (SSIM) chain is batched over
    (f_i, scale) like main_phase's loss terms (round 4); the per-scale
    smooth_loss runs at each scale's own resolution and stays a loop."""
    n_s = len(scales)
    reg5 = jnp.stack(
        [jnp.stack([outputs[("registration", s, f_i)] for s in scales], axis=1)
         for f_i in (-1, 1)])  # [2, B, n_s, H, W, 3]
    ref5 = jax.lax.stop_gradient(jnp.stack(
        [jnp.stack([outputs[("refined", s, f_i)] for s in scales], axis=1)
         for f_i in (-1, 1)]))
    occu5 = jax.lax.stop_gradient(jnp.stack(
        [outputs[("occu_mask_backward", 0, f_i)]
         for f_i in (-1, 1)]))[:, :, None]
    bt = reg5.shape[1]
    rep5 = reprojection_loss(
        reg5.reshape(-1, *reg5.shape[3:]), ref5.reshape(-1, *ref5.shape[3:]),
        use_ssim).reshape(2, bt, n_s, *reg5.shape[3:5], 1)
    l_reg_fs = ((rep5 * occu5).sum(axis=(1, 3, 4, 5))
                / occu5.sum(axis=(1, 3, 4, 5)))  # [2, n_s]

    total = 0.0
    for si, s in enumerate(scales):
        color = batch[("color", 0, s)]
        loss_smooth = 0.0
        for f_i in (-1, 1):
            loss_smooth += smooth_loss(outputs[("position", s, f_i)], color)
        loss_reg = l_reg_fs[:, si].sum()
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

    # image synthesis + temporal depth errors (trainer:808-898).
    # Round-4 batching: the geometry (backproject/project/rigid flow) is
    # cheap VPU math and stays per-(s, f_i); the EXPENSIVE parts — the
    # color synthesis warps (8x same-source grid_sample) and the 16
    # temporal depth warps — collapse into one kernel launch each
    # (img_tile for the shared color frames; batch-axis stacking for the
    # per-(s, f_i) depth maps).  Per-element results are unchanged.
    # Round-5 geometry batching (the round-4 VERDICT's named breadth
    # candidate): the per-(scale, frame) geometry — full-res disparity
    # resize -> depth -> backproject -> project — runs ONCE on a
    # scale-stacked [n_s*BT] axis instead of 4 resizes + 4 backprojects
    # + 8 projects (+8 rigid_flows), and the color-synthesis grids come
    # out of one transpose instead of per-frame stacks.  Per-element
    # math identical (the stacked ops are batched copies of the same
    # einsums); loss protocol parity pins it.  The reference's
    # ("position_depth", s, f_i) rigid-flow outputs (trainer:846-850) are
    # no longer materialized here: no loss term or logged panel consumes
    # them (XLA already dead-code-eliminated them inside the jitted
    # step), and they are reconstructible from sample/depth if a future
    # consumer appears.
    n_s_g = len(scales)
    src_depth_of = {}
    disp_full = jnp.stack(
        [resize2d(outputs[("disp", s)], (H, W), "bilinear", align_corners=True)
         for s in scales], axis=0)                    # [n_s, BT, H, W, 1]
    bt_g = disp_full.shape[1]
    _, depth_all = disp_to_depth(disp_full, cfg["min_depth"], cfg["max_depth"])
    for si, s in enumerate(scales):
        outputs[("depth", 0, s)] = depth_all[si]
    points_all = backproject_depth(
        depth_all.reshape(n_s_g * bt_g, H, W, 1),
        jnp.tile(inv_K, (n_s_g, 1, 1)))
    pix_of = {}
    for f_i in (-1, 1):
        T_mat = outputs[("cam_T_cam", 0, f_i)]
        pix_all, srcd_all = project_3d(
            points_all, jnp.tile(cam_K, (n_s_g, 1, 1)),
            jnp.tile(T_mat, (n_s_g, 1, 1)), H, W)
        pix_of[f_i] = pix_all.reshape(n_s_g, bt_g, H, W, 2)
        srcd = srcd_all.reshape(n_s_g, bt_g, *srcd_all.shape[1:])
        for si, s in enumerate(scales):
            outputs[("sample", f_i, s)] = pix_of[f_i][si]
            src_depth_of[(s, f_i)] = srcd[si]

    # batched color synthesis: one launch, source frames shared across
    # scales (grid order (f_i, t, s) — see _stack_sf)
    grids = [jnp.transpose(pix_of[f_i], (1, 0, 2, 3, 4)).reshape(-1, H, W, 2)
             for f_i in (-1, 1)]
    src = jnp.concatenate([batch[("color", -1, 0)], batch[("color", 1, 0)]], axis=0)
    col = grid_sample(src, jnp.concatenate(grids, axis=0), padding_mode="border",
                      align_corners=True, img_grad=False, img_tile=len(scales))
    col = col.reshape(2, -1, len(scales), H, W, col.shape[-1])
    col5 = col  # kept stacked for the batched loss terms below
    for fi_idx, f_i in enumerate((-1, 1)):
        for s_idx, s in enumerate(scales):
            outputs[("color", f_i, s)] = col[fi_idx, :, s_idx]

    # batched temporal depth warps: cross-frame reprojection samples
    # (trainer:871-885) and flow-warped depths (trainer:887-898) are all
    # zeros-mode C=1 warps at [B*T-1, H, W] — one launch for all 16,
    # with the FUSED backward kernel (depth needs both grads)
    dep_imgs, dep_grids, metas = [], [], []
    for s in scales:
        depth = outputs[("depth", 0, s)]
        for f_i in (-1, 1):
            pix = outputs[("sample", f_i, s)]
            if f_i == 1:
                dep_imgs.append(depth[1:])
                dep_grids.append(pix[:-1])
            else:
                dep_imgs.append(depth[:-1])
                dep_grids.append(pix[1:])
            metas.append(("reproj", s, f_i))
    for s in scales:
        depth = outputs[("depth", 0, s)]
        for f_i in (-1, 1):
            hi = outputs[("position", "high", s, f_i)]
            if f_i == 1:
                dep_imgs.append(depth[:-1])
                dep_grids.append(flow_to_grid(hi[:-1]))
            else:
                dep_imgs.append(depth[1:])
                dep_grids.append(flow_to_grid(hi[1:]))
            metas.append(("flow", s, f_i))
    sampled_all = grid_sample(
        jnp.concatenate(dep_imgs, axis=0), jnp.concatenate(dep_grids, axis=0),
        padding_mode="zeros", align_corners=True,
    )
    for (kind, s, f_i), sampled in zip(metas, jnp.split(sampled_all, len(metas), axis=0)):
        if kind == "reproj":
            src_depths = src_depth_of[(s, f_i)]
            src_depth = (src_depths[:-1] if f_i == 1 else src_depths[1:]).reshape(sampled.shape)
            outputs[("reproj_depth_error", s, f_i)] = _masked_mean(
                jnp.abs(src_depth - sampled), sampled > 1e-3
            )
        else:
            depth = outputs[("depth", 0, s)]
            fwd = depth[1:] if f_i == 1 else depth[:-1]
            outputs[("flow_depth_error", s, f_i)] = _masked_mean(
                jnp.abs(sampled - fwd), sampled > 1e-3
            )

    # losses (trainer:913-971); temporal_weight gates the
    # depth-consistency terms (trainer:950, 1 when tuning temporal LoRA).
    # Round-4 batching: the reprojection (SSIM), transform-constraint and
    # smooth_bright chains are all FULL-RES per (scale, frame) — the
    # reference's 8-iteration loop lowers them as ~hundreds of small
    # fusions (fwd+bwd); stacking (f_i, scale) on leading axes computes
    # each chain once on [2, B, n_s, H, W, C] and reduces per (f_i, s),
    # identical math per element (the per-(s, f_i) sums only reassociate).
    losses = {}
    total = 0.0
    n_s = len(scales)
    bt = col.shape[1]

    def stack5(key_of):
        return jnp.stack(
            [jnp.stack([key_of(s, f_i) for s in scales], axis=1)
             for f_i in (-1, 1)])  # [2, B, n_s, H, W, C]

    refined5 = stack5(lambda s, f: outputs[("refined", s, f)])
    trans5 = stack5(lambda s, f: outputs[("transform", "high", s, f)])
    reg5 = jax.lax.stop_gradient(
        stack5(lambda s, f: outputs[("registration", s, f)]))
    reg0_5 = jax.lax.stop_gradient(jnp.stack(
        [outputs[("registration", 0, f_i)] for f_i in (-1, 1)]))[:, :, None]
    occu5 = jax.lax.stop_gradient(jnp.stack(
        [outputs[("occu_mask_backward", 0, f_i)]
         for f_i in (-1, 1)]))[:, :, None]  # [2, B, 1, H, W, 1]

    def flat(a):
        return a.reshape(-1, *a.shape[3:])

    rep5 = reprojection_loss(flat(col5), flat(refined5), use_ssim).reshape(
        2, bt, n_s, H, W, 1)
    occ_den = occu5.sum(axis=(1, 3, 4, 5))                       # [2, 1]
    l_rep_fs = (rep5 * occu5).sum(axis=(1, 3, 4, 5)) / occ_den   # [2, n_s]
    l_trans_fs = (jnp.abs(refined5 - reg0_5).mean(-1, keepdims=True)
                  * occu5).sum(axis=(1, 3, 4, 5)) / occ_den
    # smooth_bright (geometry/losses.py:66), batched: target - pred with
    # target = color0, pred = stop(registration) — per-(f_i, s) sums
    color0 = batch[("color", 0, 0)][None, :, None]
    residue = color0 - reg5
    gtx = jnp.abs(trans5[..., :, :-1, :] - trans5[..., :, 1:, :]).mean(-1, keepdims=True)
    gty = jnp.abs(trans5[..., :-1, :, :] - trans5[..., 1:, :, :]).mean(-1, keepdims=True)
    grx = jnp.abs(residue[..., :, :-1, :] - residue[..., :, 1:, :]).mean(-1, keepdims=True)
    gry = jnp.abs(residue[..., :-1, :, :] - residue[..., 1:, :, :]).mean(-1, keepdims=True)
    mask_x = occu5[..., :, :-1, :]
    mask_y = occu5[..., :-1, :, :]
    l_cvt_fs = ((gtx * jnp.exp(-grx) * mask_x).sum(axis=(1, 3, 4, 5))
                / mask_x.sum(axis=(1, 3, 4, 5))
                + (gty * jnp.exp(-gry) * mask_y).sum(axis=(1, 3, 4, 5))
                / mask_y.sum(axis=(1, 3, 4, 5)))                 # [2, n_s]

    for si, s in enumerate(scales):
        color = batch[("color", 0, s)]
        disp = outputs[("disp", s)]
        if disp.shape[1:3] != color.shape[1:3]:
            disp = resize2d(disp, color.shape[1:3], "bilinear", align_corners=True)

        l_rep = l_rep_fs[:, si].sum()
        l_trans = l_trans_fs[:, si].sum()
        l_cvt = l_cvt_fs[:, si].sum()
        l_dr = (outputs[("reproj_depth_error", s, -1)]
                + outputs[("reproj_depth_error", s, 1)])
        l_df = (outputs[("flow_depth_error", s, -1)]
                + outputs[("flow_depth_error", s, 1)])

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
