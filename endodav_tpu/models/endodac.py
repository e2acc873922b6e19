"""EndoDAC — single-frame LoRA-adapted ViT depth model.

Counterpart of models/endodac/endodac.py:144-272: DINOv2 ViT-S/B with
LoRA-injected MLPs feeding a DPT decoder with four sigmoid HeadDepth
outputs.  Per-size tables (:178-207) are reproduced in `ENDODAC_CONFIGS`.

Forward contract (endodac.py:244-257): input [B, H, W, 3] in [0,1]
(5D video input is flattened), bilinear align_corners=True resize to
`image_shape`, optional ImageNet normalize (`pre_norm`, off by default),
4 intermediate ViT taps, DPT -> {("disp", s): [B, h_s, w_s, 1]}.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from endodav_tpu.models.dpt import DPTDecoder
from endodav_tpu.models.vit import VIT_CONFIGS, DinoViT
from endodav_tpu.ops.resize import resize2d

__all__ = ["EndoDAC", "ENDODAC_CONFIGS", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

ENDODAC_CONFIGS = {
    # endodac.py:192-199.  NOTE the tap indices: endodac.forward passes the
    # INT 4 to get_intermediate_layers (endodac.py:252), which DINOv2 reads
    # as "the last 4 blocks" (vision_transformer.py:284) — i.e. (8,9,10,11)
    # for both 12-block sizes.  The `intermediate_layers` table at
    # endodac.py:184-187 is dead code; full-model parity
    # (tests/test_fullmodel_parity.py) pins the live behaviour.
    "vits": dict(features=64, out_channels=(48, 96, 192, 384), intermediate=(8, 9, 10, 11)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768), intermediate=(8, 9, 10, 11)),
}


def _endodac_lora_alpha(lora_type: str, r: int) -> float | None:
    # endodac.py:222-227 — plain lora keeps torch default alpha=1,
    # dvlora uses alpha=r.
    return {"lora": 1.0, "dvlora": float(r)}.get(lora_type)


class EndoDAC(nn.Module):
    backbone_size: str = "vits"  # vits | vitb
    r: int = 4
    image_shape: tuple[int, int] = (224, 280)
    lora_type: str = "lora"
    residual_block_indexes: Sequence[int] = ()
    include_cls_token: bool = True
    use_cls_token: bool = False  # DPT readout-projection toggle
    use_bn: bool = False
    pre_norm: bool = False
    inv_sigmoid: bool = False
    conv_head: bool = True
    # tensor parallelism for the ViT trunk (parallel/tp.py; same
    # 'pretrained' param subtree as EndoDAV, so the same sharding applies)
    tp_groups: int = 1
    # scan-over-layers trunk (models/vit.py:DinoViT.scan_blocks) — same
    # function/params, one compiled block body per uniform segment
    scan_trunk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels, train: bool = False, dash_phase2: bool = False):
        if pixels.ndim == 5:
            pixels = pixels.reshape(-1, *pixels.shape[2:])
        x = resize2d(pixels, self.image_shape, "bilinear", align_corners=True)
        if self.pre_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std

        cfg = ENDODAC_CONFIGS[self.backbone_size]
        vit_cfg = VIT_CONFIGS[self.backbone_size]
        taps = DinoViT(
            **vit_cfg,
            residual_block_indexes=tuple(self.residual_block_indexes),
            include_cls_token=self.include_cls_token,
            lora_variant=self.lora_type,
            lora_rank=self.r,
            lora_alpha=_endodac_lora_alpha(self.lora_type, self.r),
            tp_groups=self.tp_groups,
            scan_blocks=self.scan_trunk,
            dtype=self.dtype,
            name="pretrained",
        )(x, cfg["intermediate"], dash_phase2)

        ph, pw = self.image_shape[0] // 14, self.image_shape[1] // 14
        return DPTDecoder(
            in_channels=vit_cfg["embed_dim"],
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            use_bn=self.use_bn,
            use_clstoken=self.use_cls_token,
            temporal=False,
            conv_head=self.conv_head,
            inv_sigmoid=self.inv_sigmoid,
            dtype=self.dtype,
            name="depth_head",
        )(taps, (ph, pw), frames=1, train=train, dash_phase2=dash_phase2)
