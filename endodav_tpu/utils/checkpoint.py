"""Checkpoint I/O and torch-.pth interop.

Native format: flax msgpack pytrees saved per-component in the reference's
directory layout (log_dir/<model_type>/models/weights_{epoch|last}/<name>,
trainer_end_to_end_video.py:1094-1115), with height/width/use_stereo
metadata stored alongside (the reference stuffs them into the state dict,
:1104-1112) and a JSON options snapshot (:1083-1092).

Torch interop: `torch_to_flax` maps a reference state_dict (endodav /
endodac / pose-stack .pth) onto our flax param trees.  Matching the
reference loader semantics (strict=False partial load with key filtering,
endodav.py:139-144, trainer:1126-1133): unmatched torch keys are reported,
missing flax leaves keep their initialization.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_components",
    "load_components",
    "torch_to_flax",
    "load_torch_file",
]


# ------------------------------------------------------------- native IO

def save_pytree(path: str, tree: Any, metadata: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2)


def load_pytree(path: str, like: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


def load_metadata(path: str) -> dict:
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def save_components(folder: str, components: dict[str, Any], metadata: dict | None = None) -> None:
    """Per-component save (depth_model / pose / position / ... )."""
    os.makedirs(folder, exist_ok=True)
    for name, tree in components.items():
        save_pytree(os.path.join(folder, f"{name}.msgpack"), tree,
                    metadata if name == "depth_model" else None)


def load_components(folder: str, like: dict[str, Any], names=None) -> dict[str, Any]:
    """Load per-component checkpoints: native .msgpack, or reference-style
    torch .pth (trainer_end_to_end_video.py:save_model writes one .pth per
    component) converted through the rule tables — so training can resume
    directly from a reference checkpoint folder."""
    out = dict(like)
    for name in (names or like.keys()):
        path = os.path.join(folder, f"{name}.msgpack")
        torch_path = os.path.join(folder, f"{name}.pth")
        if os.path.exists(path):
            out[name] = load_pytree(path, like[name])
        elif os.path.exists(torch_path):
            sd = load_torch_file(torch_path)
            comp = _component_kind(name, sd)
            out[name], _ = torch_to_flax(sd, comp, like[name])
            print(f"[ckpt] converted {name}.pth ({comp} rules)")
    return out


def _component_kind(name: str, sd: dict) -> str:
    """Rule table for a per-component torch checkpoint by name/keys."""
    if name == "depth_model":
        return "endodac" if any(k.startswith("depth_head.") for k in sd) else "endodav"
    if "encoder" in name:
        return "resnet_encoder"
    return "decoder"


# ------------------------------------------------------- torch conversion

def load_torch_file(path: str) -> dict[str, np.ndarray]:
    """Load a torch .pth state dict to numpy without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_w(v):       # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(v, (2, 3, 1, 0))


def _convT_w(v):      # torch ConvTranspose (I, O, kh, kw) -> flax transpose_kernel (kh, kw, O, I)
    return np.transpose(v, (2, 3, 1, 0))


def _lin_w(v):        # torch (O, I) -> flax (I, O)
    return np.transpose(v, (1, 0))


_SKIP_PATTERNS = [
    r"\.num_batches_tracked$",
    r"pos_encoder\.pe$",
    r"^height$", r"^width$", r"^use_stereo$",
    r"convs_suqeeze",              # IntrinsicsHead defines but never uses it
    # FeatureFusionBlock.resConfUnit1 only runs when a skip input exists
    # (util/blocks.py:116-120); refinenet4 is the pyramid top and never
    # gets one, so its unit is dead weight we don't instantiate.
    r"refinenet4\.resConfUnit1\.",
    r"^net\.",                     # PoseDecoder ModuleList aliases of convs.*
    r"\.lora_change_",             # DashLinear debug params
    r"\.ranknum$",
]


def _vit_block_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    """Rules for one ViT block; pfx_t like 'pretrained.blocks.3.'"""
    f = pfx_f
    return [
        (pfx_t + "norm1.weight", f + ("norm1", "scale"), None),
        (pfx_t + "norm1.bias", f + ("norm1", "bias"), None),
        (pfx_t + "attn.qkv.weight", f + ("attn", "qkv", "kernel"), _lin_w),
        (pfx_t + "attn.qkv.bias", f + ("attn", "qkv", "bias"), None),
        (pfx_t + "attn.proj.weight", f + ("attn", "proj", "kernel"), _lin_w),
        (pfx_t + "attn.proj.bias", f + ("attn", "proj", "bias"), None),
        (pfx_t + "ls1.gamma", f + ("ls1", "gamma"), None),
        (pfx_t + "ls2.gamma", f + ("ls2", "gamma"), None),
        (pfx_t + "norm2.weight", f + ("norm2", "scale"), None),
        (pfx_t + "norm2.bias", f + ("norm2", "bias"), None),
    ]


def _lora_dense_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    rules = [
        (pfx_t + "weight", pfx_f + ("kernel",), _lin_w),
        (pfx_t + "bias", pfx_f + ("bias",), None),
    ]
    for nm in ("lora_A", "lora_B", "lora_U", "lora_V", "lora_index", "weight_u_top", "weight_vt_top"):
        rules.append((pfx_t + nm, pfx_f + (nm,), None))
    # SSB stores column vectors (in,1)/(out,1); ours match that shape.
    return rules


def _res_bottleneck_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    rules = []
    for i in (1, 2, 3):
        rules.append((pfx_t + f"conv{i}.weight", pfx_f + (f"conv{i}", "kernel"), _conv_w))
        rules.append((pfx_t + f"norm{i}.weight", pfx_f + (f"norm{i}", "weight"), None))
        rules.append((pfx_t + f"norm{i}.bias", pfx_f + (f"norm{i}", "bias"), None))
    return rules


def _motion_module_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    tt = pfx_t + "temporal_transformer."
    rules = [
        (tt + "norm.weight", pfx_f + ("norm", "scale"), None),
        (tt + "norm.bias", pfx_f + ("norm", "bias"), None),
        (tt + "proj_in.weight", pfx_f + ("proj_in", "kernel"), _lin_w),
        (tt + "proj_in.bias", pfx_f + ("proj_in", "bias"), None),
        (tt + "proj_out.weight", pfx_f + ("proj_out", "kernel"), _lin_w),
        (tt + "proj_out.bias", pfx_f + ("proj_out", "bias"), None),
    ]
    for d in range(4):  # generous upper bound on transformer blocks
        bt = tt + f"transformer_blocks.{d}."
        bf = pfx_f + (f"transformer_blocks_{d}",)
        for i in range(4):
            at = bt + f"attention_blocks.{i}."
            af = bf + (f"attn_{i}",)
            for nm in ("to_q", "to_k", "to_v"):
                rules.append((at + f"{nm}.weight", af + (nm, "kernel"), _lin_w))
            rules.append((at + "to_out.0.weight", af + ("to_out", "kernel"), _lin_w))
            rules.append((at + "to_out.0.bias", af + ("to_out", "bias"), None))
            rules.append((bt + f"norms.{i}.weight", bf + (f"norm_{i}", "scale"), None))
            rules.append((bt + f"norms.{i}.bias", bf + (f"norm_{i}", "bias"), None))
        rules.append((bt + "ff.net.0.proj.weight", bf + ("ff", "proj_in", "kernel"), _lin_w))
        rules.append((bt + "ff.net.0.proj.bias", bf + ("ff", "proj_in", "bias"), None))
        rules.extend(_lora_dense_rules(bt + "ff.net.2.", bf + ("ff", "proj_out")))
        rules.append((bt + "ff_norm.weight", bf + ("ff_norm", "scale"), None))
        rules.append((bt + "ff_norm.bias", bf + ("ff_norm", "bias"), None))
    return rules


def _dpt_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    """DPT decoder rules; pfx_t 'head.' (endodav) or 'depth_head.' (endodac)."""
    rules = []
    for i in range(4):
        rules.append((pfx_t + f"projects.{i}.weight", pfx_f + (f"projects_{i}", "kernel"), _conv_w))
        rules.append((pfx_t + f"projects.{i}.bias", pfx_f + (f"projects_{i}", "bias"), None))
        rules.append(
            (pfx_t + f"readout_projects.{i}.0.weight", pfx_f + (f"readout_projects_{i}", "kernel"), _lin_w)
        )
        rules.append((pfx_t + f"readout_projects.{i}.0.bias", pfx_f + (f"readout_projects_{i}", "bias"), None))
    rules.append((pfx_t + "resize_layers.0.weight", pfx_f + ("resize_layers_0", "kernel"), _convT_w))
    rules.append((pfx_t + "resize_layers.0.bias", pfx_f + ("resize_layers_0", "bias"), None))
    rules.append((pfx_t + "resize_layers.1.weight", pfx_f + ("resize_layers_1", "kernel"), _convT_w))
    rules.append((pfx_t + "resize_layers.1.bias", pfx_f + ("resize_layers_1", "bias"), None))
    rules.append((pfx_t + "resize_layers.3.weight", pfx_f + ("resize_layers_3", "kernel"), _conv_w))
    rules.append((pfx_t + "resize_layers.3.bias", pfx_f + ("resize_layers_3", "bias"), None))
    for i in (1, 2, 3, 4):
        rules.append((pfx_t + f"scratch.layer{i}_rn.weight", pfx_f + (f"layer{i}_rn", "kernel"), _conv_w))
        rf = pfx_f + (f"refinenet{i}",)
        rt = pfx_t + f"scratch.refinenet{i}."
        for unit in ("resConfUnit1", "resConfUnit2"):
            for c in ("conv1", "conv2"):
                rules.append((rt + f"{unit}.{c}.weight", rf + (unit, c, "kernel"), _conv_w))
                rules.append((rt + f"{unit}.{c}.bias", rf + (unit, c, "bias"), None))
        rules.append((rt + "out_conv.weight", rf + ("out_conv", "kernel"), _conv_w))
        rules.append((rt + "out_conv.bias", rf + ("out_conv", "bias"), None))
    # multi-scale sigmoid heads (HeadDepth: torch Sequential indices 0/2/4)
    for i in (1, 2, 3, 4):
        ht = pfx_t + f"conv_depth_{i}.head."
        hf = pfx_f + (f"conv_depth_{i}",)
        for ti, fn in ((0, "conv0"), (2, "conv2"), (4, "conv4")):
            rules.append((ht + f"{ti}.weight", hf + (fn, "kernel"), _conv_w))
            rules.append((ht + f"{ti}.bias", hf + (fn, "bias"), None))
    # single output-conv head (disable_conv_head path)
    ot = pfx_t + "scratch."
    of = pfx_f + ("scratch_output",)
    rules.append((ot + "output_conv1.weight", of + ("output_conv1", "kernel"), _conv_w))
    rules.append((ot + "output_conv1.bias", of + ("output_conv1", "bias"), None))
    rules.append((ot + "output_conv2.0.weight", of + ("output_conv2_0", "kernel"), _conv_w))
    rules.append((ot + "output_conv2.0.bias", of + ("output_conv2_0", "bias"), None))
    rules.append((ot + "output_conv2.2.weight", of + ("output_conv2_2", "kernel"), _conv_w))
    rules.append((ot + "output_conv2.2.bias", of + ("output_conv2_2", "bias"), None))
    for m in range(4):
        rules.extend(_motion_module_rules(pfx_t + f"motion_modules.{m}.", pfx_f + (f"motion_modules_{m}",)))
    return rules


def _vit_rules(pfx_t: str, pfx_f: tuple[str, ...], depth: int = 40):
    rules = [
        (pfx_t + "cls_token", pfx_f + ("cls_token",), None),
        (pfx_t + "pos_embed", pfx_f + ("pos_embed",), None),
        (pfx_t + "mask_token", pfx_f + ("mask_token",), None),
        (pfx_t + "patch_embed.proj.weight", pfx_f + ("patch_embed", "kernel"), _conv_w),
        (pfx_t + "patch_embed.proj.bias", pfx_f + ("patch_embed", "bias"), None),
        (pfx_t + "norm.weight", pfx_f + ("norm", "scale"), None),
        (pfx_t + "norm.bias", pfx_f + ("norm", "bias"), None),
    ]
    for i in range(depth):
        bt = pfx_t + f"blocks.{i}."
        bf = pfx_f + (f"blocks_{i}",)
        rules.extend(_vit_block_rules(bt, bf))
        rules.extend(_lora_dense_rules(bt + "mlp.fc1.", bf + ("mlp", "fc1")))
        rules.extend(_lora_dense_rules(bt + "mlp.fc2.", bf + ("mlp", "fc2")))
        rules.extend(_res_bottleneck_rules(bt + "residual_.", bf + ("residual_",)))
    return rules


def _resnet_rules(pfx_t: str, pfx_f: tuple[str, ...]):
    """ResnetEncoder rules; torch prefix 'encoder.'"""
    rules = [
        (pfx_t + "conv1.weight", pfx_f + ("conv1", "kernel"), _conv_w),
    ]
    bn_map = [("weight", "scale", "params"), ("bias", "bias", "params"),
              ("running_mean", "mean", "batch_stats"), ("running_var", "var", "batch_stats")]
    for tn, fn, col in bn_map:
        rules.append((pfx_t + f"bn1.{tn}", (col,) + pfx_f + ("bn1", fn), "COLLECTION"))
    for stage in range(1, 5):
        for b in range(40):
            bt = pfx_t + f"layer{stage}.{b}."
            bf = pfx_f + (f"layer{stage}_{b}",)
            for conv in ("conv1", "conv2", "conv3"):
                rules.append((bt + f"{conv}.weight", bf + (conv, "kernel"), _conv_w))
            for bn in ("bn1", "bn2", "bn3"):
                for tn, fn, col in bn_map:
                    rules.append((bt + f"{bn}.{tn}", (col,) + bf + (bn, fn), "COLLECTION"))
            rules.append((bt + "downsample.0.weight", bf + ("downsample_conv", "kernel"), _conv_w))
            for tn, fn, col in bn_map:
                rules.append((bt + f"downsample.1.{tn}", (col,) + bf + ("downsample_bn", fn), "COLLECTION"))
    return rules


def _decoder_rules():
    """PoseDecoder / IntrinsicsHead / Position / Transform / Depth decoders."""
    rules = []
    # PoseDecoder (ModuleDict 'convs.')
    for tn, fn in [("squeeze", "squeeze"), ("pose_0", "pose_0"), ("pose_1", "pose_1"), ("pose_2", "pose_2")]:
        rules.append((f"convs.{tn}.weight", (fn, "kernel"), _conv_w))
        rules.append((f"convs.{tn}.bias", (fn, "bias"), None))
    # IntrinsicsHead
    rules.append(("focal_length_conv.weight", ("focal_length_conv", "kernel"), _conv_w))
    rules.append(("offsets_conv.weight", ("offsets_conv", "kernel"), _conv_w))
    # U-Net decoders (Position/Transform/Depth): convs.upconv_{i}_{j}.conv.conv
    for i in range(5):
        for j in range(2):
            rules.append(
                (f"convs.upconv_{i}_{j}.conv.conv.weight", ("unet", f"upconv_{i}_{j}", "conv", "kernel"), _conv_w)
            )
            rules.append(
                (f"convs.upconv_{i}_{j}.conv.conv.bias", ("unet", f"upconv_{i}_{j}", "conv", "bias"), None)
            )
    for s in range(4):
        rules.append((f"convs.position_conv_{s}.weight", (f"position_conv_{s}", "kernel"), _conv_w))
        rules.append((f"convs.position_conv_{s}.bias", (f"position_conv_{s}", "bias"), None))
        rules.append((f"convs.transform_conv_{s}.conv.weight", (f"transform_conv_{s}", "conv", "kernel"), _conv_w))
        rules.append((f"convs.transform_conv_{s}.conv.bias", (f"transform_conv_{s}", "conv", "bias"), None))
        rules.append((f"convs.dispconv_{s}.conv.weight", (f"dispconv_{s}", "conv", "kernel"), _conv_w))
        rules.append((f"convs.dispconv_{s}.conv.bias", (f"dispconv_{s}", "conv", "bias"), None))
    # PoseCNN
    for i in range(7):
        rules.append((f"convs.{i}.weight", (f"convs_{i}", "kernel"), _conv_w))
        rules.append((f"convs.{i}.bias", (f"convs_{i}", "bias"), None))
    rules.append(("pose_conv.weight", ("pose_conv", "kernel"), _conv_w))
    rules.append(("pose_conv.bias", ("pose_conv", "bias"), None))
    return rules


def build_rules(component: str):
    """Full rule list for a checkpoint component.

    component: 'endodav' | 'endodac' | 'resnet_encoder' | 'decoder'
    """
    if component == "endodav":
        return _vit_rules("pretrained.", ("pretrained",)) + _dpt_rules("head.", ("head",))
    if component == "endodac":
        return _vit_rules("pretrained.", ("pretrained",)) + _dpt_rules("depth_head.", ("depth_head",))
    if component == "resnet_encoder":
        return _resnet_rules("encoder.", ())
    if component == "decoder":
        return _decoder_rules()
    raise ValueError(component)


def torch_to_flax(state_dict: dict[str, np.ndarray], component: str, variables: Any, strict: bool = False):
    """Map a torch state_dict onto a flax variables dict (params [+
    batch_stats]).  Returns (new_variables, report) where report lists
    used/ignored torch keys and untouched flax leaves."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in state_dict.items()}
    rules = build_rules(component)

    has_collections = "params" in variables
    flat = {}
    if has_collections:
        for col, tree in variables.items():
            for k, v in flatten_dict(tree).items():
                flat[(col,) + k] = v
    else:
        flat = dict(flatten_dict(variables))

    used, mismatched, written = [], [], set()
    for torch_key, flax_key, transform in rules:
        if torch_key not in sd:
            continue
        if transform == "COLLECTION":
            key = flax_key if has_collections else flax_key[1:]
            value = sd[torch_key]
        else:
            key = (("params",) + flax_key) if has_collections else flax_key
            value = transform(sd[torch_key]) if transform else sd[torch_key]
        if key not in flat:
            continue
        if tuple(flat[key].shape) != tuple(value.shape):
            mismatched.append((torch_key, tuple(value.shape), tuple(flat[key].shape)))
            continue
        flat[key] = jnp.asarray(value, dtype=flat[key].dtype)
        written.add(key)
        used.append(torch_key)

    ignored = [
        k for k in sd
        if k not in used and not any(re.search(p, k) for p in _SKIP_PATTERNS)
    ]
    untouched = ["/".join(map(str, k)) for k in flat if k not in written]
    report = {"used": used, "ignored": ignored, "mismatched": mismatched,
              "untouched": untouched}
    if strict and (ignored or mismatched):
        raise ValueError(f"torch_to_flax strict load failed: {report}")

    if has_collections:
        out = {}
        for col in variables:
            out[col] = unflatten_dict({k[1:]: v for k, v in flat.items() if k[0] == col})
        return out, report
    return unflatten_dict(flat), report
