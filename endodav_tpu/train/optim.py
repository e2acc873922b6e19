"""Gated Adam + step-indexed trainability schedules.

The reference flips `requires_grad` per step to implement its schedules
(trainer_end_to_end_video.py:277-363 + models/endodav/layers.py:5-34):
depth<->pose alternation (`tune_depth_interval`), the DV-LoRA warm-up
switch A/B -> U/V (`warm_up_step`), and spatial<->temporal LoRA
alternation (`tune_spatial_interval`/`tune_temporal_interval`).

In a jit-compiled world the parameter structure must stay static, so:
  * every main-group leaf gets a *static* group label (`assign_groups`),
  * per-step 0/1 gate scalars per group are computed inside the step
    (`schedule_gates` — pure jnp of the step counter),
  * `gated_adam_update` applies torch-semantics Adam where both the
    parameter update and the moment/bias-correction state freeze when
    the gate is 0 — exactly what torch does for requires_grad=False
    params (grad None => state untouched), with per-leaf step counts.

Note: the reference additionally *never registers* lora_U/lora_V or
temporal-LoRA params with its optimizer (it collects trainable params
once at init, trainer:80, before any schedule flips) — so its DV-LoRA
post-warm-up phase silently updates nothing.  We implement the schedule
as documented/intended; pass
``cfg["legacy_frozen_groups"] = LEGACY_FROZEN_GROUPS`` (the
``--legacy_frozen_groups`` flag) to force those groups' gates to zero
and reproduce the reference's literal optimizer membership.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "assign_groups", "schedule_gates", "init_adam", "gated_adam_update",
    "gates_tree", "LEGACY_FROZEN_GROUPS",
]

# Groups the reference's Adam never sees because parameters_to_train is
# collected once at Trainer init (trainer_end_to_end_video.py:80), when
# mark_only_part_as_trainable has left only lora_A/B + residual_/
# conv_depth_ trainable and all motion modules frozen (endodav.py:146-148):
# post-warm-up lora_U/V and every temporal-LoRA param stay unregistered,
# so the set_train flag flips silently update nothing for them.
LEGACY_FROZEN_GROUPS = ("spatial_uv", "temporal_ab", "temporal_uv")


def assign_groups(main_params: dict) -> dict:
    """Label every leaf of the main param group with a schedule group.

    main_params: {'depth_model': tree, 'pose_encoder': tree, ...}.
    Returns a pytree of str with the same structure.
    """

    def label_depth(path_parts, _leaf):
        name = path_parts[-1]
        temporal = any("motion_modules" in p for p in path_parts)
        side = "temporal" if temporal else "spatial"
        if name in ("lora_A", "lora_B"):
            return f"{side}_ab"
        if name in ("lora_U", "lora_V"):
            return f"{side}_uv"
        if name in ("lora_index", "weight_u_top", "weight_vt_top"):
            return "dash_index" if name == "lora_index" else "frozen"
        if any(p.startswith("residual_") or p.startswith("conv_depth_") for p in path_parts):
            return "adapt"
        if any("output_conv" in p or p == "scratch_output" for p in path_parts):
            return "output_conv"
        return "frozen"

    def walk(tree, fn, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, fn, path + (k,)) for k, v in tree.items()}
        return fn(path, tree)

    out = {}
    for comp, tree in main_params.items():
        if comp == "depth_model":
            out[comp] = walk(tree, label_depth)
        else:
            out[comp] = walk(tree, lambda p, l: "pose")
    return out


def schedule_gates(step, cfg: dict, dash_phase2: bool = False) -> dict:
    """Per-group 0/1 gates from the global step (pure jnp).

    cfg keys: lora_type, warm_up_step, tune_depth_interval, temporal_lora,
    tune_spatial_interval, tune_temporal_interval, train_output_conv.
    Returns dict group->scalar plus 'tune_temporal' for the loss gate.
    """
    one = jnp.asarray(1.0)
    zero = jnp.asarray(0.0)

    if cfg["lora_type"] == "dvlora":
        warm = jnp.where(step > cfg["warm_up_step"], zero, one)
    else:
        warm = one

    tdi = cfg["tune_depth_interval"]
    if tdi > 0:
        tune_depth = jnp.where((step % (2 * tdi)) >= tdi, one, zero)
        tune_pose = one - tune_depth
    else:
        tune_depth = one
        tune_pose = one

    if cfg["temporal_lora"]:
        total = cfg["tune_spatial_interval"] + cfg["tune_temporal_interval"]
        spatial = jnp.where((step % total) < cfg["tune_spatial_interval"], one, zero)
        temporal = one - spatial
    else:
        spatial = one
        temporal = zero

    dash = one if dash_phase2 else zero
    gates = {
        "spatial_ab": warm * spatial * tune_depth,
        "spatial_uv": (one - warm) * spatial * tune_depth,
        "temporal_ab": warm * temporal * tune_depth,
        "temporal_uv": (one - warm) * temporal * tune_depth,
        "adapt": spatial * tune_depth,
        "output_conv": one * tune_depth if cfg["train_output_conv"] else zero,
        "dash_index": dash * spatial * tune_depth,
        "pose": tune_pose,
        "frozen": zero,
        "tune_temporal": temporal,
    }
    for grp in cfg.get("legacy_frozen_groups", ()):
        assert grp in gates, f"unknown legacy_frozen_group {grp!r}"
        gates[grp] = zero
    return gates


def gates_tree(groups: dict, gate_values: dict):
    """Materialize the per-leaf gate pytree from labels + group scalars."""
    return jax.tree_util.tree_map(lambda g: gate_values[g], groups)


def init_adam(params):
    zeros = lambda p: jnp.zeros_like(p)
    return {
        "mu": jax.tree_util.tree_map(zeros, params),
        "nu": jax.tree_util.tree_map(zeros, params),
        "count": jax.tree_util.tree_map(lambda p: jnp.zeros((), jnp.float32), params),
    }


def gated_adam_update(grads, state, params, lr, gates=None, b1=0.9, b2=0.999, eps=1e-8):
    """torch-semantics Adam with per-leaf freeze gates.

    gates: pytree of 0/1 scalars (None => all 1).  Where gate==0 the
    moments, per-leaf step count, and the parameter are all untouched.
    """
    if gates is None:
        gates = jax.tree_util.tree_map(lambda p: jnp.asarray(1.0), params)

    def upd(g, mu, nu, cnt, p, gate):
        new_cnt = cnt + gate
        new_mu = gate * (b1 * mu + (1 - b1) * g) + (1 - gate) * mu
        new_nu = gate * (b2 * nu + (1 - b2) * (g * g)) + (1 - gate) * nu
        safe_cnt = jnp.maximum(new_cnt, 1.0)
        mhat = new_mu / (1 - b1 ** safe_cnt)
        vhat = new_nu / (1 - b2 ** safe_cnt)
        new_p = p - gate * lr * mhat / (jnp.sqrt(vhat) + eps)
        return new_p, new_mu, new_nu, new_cnt

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state["mu"])
    flat_nu = treedef.flatten_up_to(state["nu"])
    flat_c = treedef.flatten_up_to(state["count"])
    flat_gate = treedef.flatten_up_to(gates)

    new_p, new_mu, new_nu, new_c = [], [], [], []
    for g, mu, nu, c, p, gate in zip(flat_g, flat_mu, flat_nu, flat_c, flat_p, flat_gate):
        p2, m2, n2, c2 = upd(g, mu, nu, c, p, gate)
        new_p.append(p2)
        new_mu.append(m2)
        new_nu.append(n2)
        new_c.append(c2)

    unflatten = jax.tree_util.tree_unflatten
    return unflatten(treedef, new_p), {
        "mu": unflatten(treedef, new_mu),
        "nu": unflatten(treedef, new_nu),
        "count": unflatten(treedef, new_c),
    }
