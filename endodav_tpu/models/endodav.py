"""EndoDAV — video depth model with temporal attention in the DPT pyramid.

Counterpart of models/endodav/endodav.py:52-160: per-frame DINOv2 ViT
(LoRA-adapted MLPs, optional temporal-FFN LoRA) + DPTDecoder in temporal
mode.  Window constants for full-video inference live here too
(endodav.py:47-50); the sliding-window algorithm itself is in
`eval/video_inference.py`, re-designed so all windows batch onto the TPU
at once instead of the reference's sequential loop.

Forward contract (endodav.py:150-160): input [B, T, H, W, 3] in [0,1],
bilinear align_corners=True resize to `image_shape`, ImageNet normalize,
ViT taps at per-encoder indices (:76-79) -> temporal DPT ->
{("disp", s): [B*T, h_s, w_s, 1]}.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from endodav_tpu.models.dpt import DPTDecoder
from endodav_tpu.models.endodac import IMAGENET_MEAN, IMAGENET_STD
from endodav_tpu.models.vit import VIT_CONFIGS, DinoViT
from endodav_tpu.ops.resize import resize2d

__all__ = ["EndoDAV", "ENDODAV_CONFIGS", "INFER_LEN", "OVERLAP", "KEYFRAMES",
           "INTERP_LEN", "prefix_map_shapes"]


def prefix_map_shapes(model: "EndoDAV"):
    """Static per-frame shapes of `decode_prefix`'s four maps
    (layer_1_rn, layer_2_rn, layer_3, layer_4) for ``model``'s config.

    The dedup serving pipeline moves the maps across jit boundaries
    FLATTENED to [frames, prod(shape)] and reshapes back inside the
    consumer jit: m1/m2 end in C=features=64, which TPU tiling pads to
    128 lanes (2x the memory), and a 4D boundary array's layout is
    producer-chosen — both measured as ~600 ms of per-chunk relayout
    traffic on device (round 5).  A 2D row is canonical and unpadded
    (every flattened length here is a multiple of 128).
    """
    ph, pw = model.image_shape[0] // 14, model.image_shape[1] // 14
    cfg = ENDODAV_CONFIGS[model.encoder]
    f, oc = cfg["features"], cfg["out_channels"]
    return ((4 * ph, 4 * pw, f), (2 * ph, 2 * pw, f), (ph, pw, oc[2]),
            # layer_4: conv k=3 s=2 with (1,1) padding on the patch grid
            ((ph - 1) // 2 + 1, (pw - 1) // 2 + 1, oc[3]))

# Sliding-window inference constants (endodav.py:47-50).
INFER_LEN = 32
OVERLAP = 10
KEYFRAMES = (6, 12, 24, 25, 26, 27, 28, 29, 30, 31)
INTERP_LEN = 8

ENDODAV_CONFIGS = {
    # trainer_end_to_end_video.py:55-58 + endodav.py:76-79
    "vits": dict(features=64, out_channels=(48, 96, 192, 384), intermediate=(2, 5, 8, 11)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024), intermediate=(4, 11, 17, 23)),
}


def _endodav_lora_alpha(lora_type: str, r: int) -> float | None:
    # endodav.py:107-118 — lora alpha=2r, dvlora alpha=r, dash alpha=2r.
    return {"lora": 2.0 * r, "dvlora": float(r), "dash": 2.0 * r}.get(lora_type)


def build_trunk(model: "EndoDAV") -> DinoViT:
    """The model's DINOv2 trunk as a standalone (unbound) module — the
    exact configuration `setup` binds as ``self.pretrained``, so its param
    tree matches ``variables["params"]["pretrained"]``.  Used by the
    scan-over-layers serving trunk (models/vit.py:scan_trunk_apply) which
    applies block params functionally outside the bound model."""
    vit_cfg = VIT_CONFIGS[model.encoder]
    return DinoViT(
        **vit_cfg,
        residual_block_indexes=tuple(model.residual_block_indexes),
        include_cls_token=model.include_cls_token,
        lora_variant=model.lora_type,
        lora_rank=model.r,
        lora_alpha=_endodav_lora_alpha(model.lora_type, model.r),
        tp_groups=model.tp_groups,
        scan_blocks=model.scan_trunk,
        quant_int8=model.int8_serving,
        dtype=model.dtype,
    )


class EndoDAV(nn.Module):
    encoder: str = "vits"  # vits | vitl
    r: int = 4
    image_shape: tuple[int, int] = (224, 280)
    lora_type: str = "dvlora"
    residual_block_indexes: Sequence[int] = ()
    include_cls_token: bool = True
    use_clstoken: bool = False
    use_bn: bool = False
    num_frames: int = 32
    pos_embedding_type: str = "ape"
    inv_sigmoid: bool = False
    temporal_lora: bool = False
    conv_head: bool = True
    out_sigmoid: bool = False
    # tensor parallelism for the ViT trunk (parallel/tp.py): >1 builds the
    # LOCAL view (run under shard_map with trunk params sharded over the
    # 'model' mesh axis; decoder stays replicated)
    tp_groups: int = 1
    # scan-over-layers trunk (models/vit.py:DinoViT.scan_blocks): same
    # function, param tree, and checkpoints; the lowering holds one block
    # body per segment instead of `depth` copies — compile-size fix for
    # vitl and for the train step's whole-graph jit.
    scan_trunk: bool = False
    # int8 serving GEMMs for the trunk projections (ops/quant.py) —
    # SERVING ONLY (round() has zero gradient); set per-model by the
    # engine (vitl merged-graph auto-default) so the decision is scoped
    # to this model instead of process-global env state (round-4
    # advisor).  ENDODAV_INT8 env var remains the explicit override.
    int8_serving: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # setup-style (not nn.compact) so `encode`/`decode` can be jitted
        # SEPARATELY via model.apply(..., method=...) — splitting the
        # whole-model compilation in two keeps vitl under remote-compile
        # service limits (eval/engine.py:depth_window_forward,
        # ENDODAV_SPLIT_COMPILE=1).  Attribute names keep the param tree
        # identical to the previous compact form ("pretrained"/"head").
        cfg = ENDODAV_CONFIGS[self.encoder]
        vit_cfg = VIT_CONFIGS[self.encoder]
        alpha = _endodav_lora_alpha(self.lora_type, self.r)
        self.pretrained = build_trunk(self)
        self.head = DPTDecoder(
            in_channels=vit_cfg["embed_dim"],
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            use_bn=self.use_bn,
            use_clstoken=self.use_clstoken,
            temporal=True,
            num_frames=self.num_frames,
            pos_embedding_type=self.pos_embedding_type,
            conv_head=self.conv_head,
            inv_sigmoid=self.inv_sigmoid,
            out_sigmoid=self.out_sigmoid,
            temporal_lora_variant=self.lora_type if self.temporal_lora else "none",
            lora_rank=self.r,
            lora_alpha=alpha,
            dtype=self.dtype,
        )

    def preprocess(self, video):
        """[B, T, H, W, 3] -> [B*T, h, w, 3] trunk input (bilinear
        align_corners resize + ImageNet normalize; endodav.py:150-156).
        Uses no flax state, so it is callable on an UNBOUND model — the
        scan-trunk serving path shares it (eval/engine.py)."""
        b, t = video.shape[0], video.shape[1]
        x = video.reshape(b * t, *video.shape[2:])
        x = resize2d(x, self.image_shape, "bilinear", align_corners=True)
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        return (x - mean) / std

    def encode(self, video, train: bool = False, dash_phase2: bool = False):
        """[B, T, H, W, 3] -> ViT taps at the encoder's intermediate
        layers (resize + ImageNet normalize + trunk; endodav.py:150-156)."""
        x = self.preprocess(video)
        cfg = ENDODAV_CONFIGS[self.encoder]
        return self.pretrained(x, cfg["intermediate"], dash_phase2)

    def decode(self, taps, frames: int, train: bool = False,
               dash_phase2: bool = False):
        """ViT taps -> {("disp", s)} via the temporal DPT head."""
        ph, pw = self.image_shape[0] // 14, self.image_shape[1] // 14
        return self.head(taps, (ph, pw), frames=frames, train=train,
                         dash_phase2=dash_phase2)

    def decode_prefix(self, taps, dash_phase2: bool = False):
        """Per-frame front half of the DPT head (models/dpt.py:
        DPTDecoder.prefix) — no op mixes frames, so the dedup serving
        pipeline runs it once per unique source frame."""
        ph, pw = self.image_shape[0] // 14, self.image_shape[1] // 14
        return self.head.prefix(taps, (ph, pw), dash_phase2)

    def decode_suffix(self, maps, frames: int, train: bool = False,
                      dash_phase2: bool = False):
        """Window half of the DPT head: temporal modules + fusion
        pyramid + heads (DPTDecoder.suffix)."""
        return self.head.suffix(maps, frames, train, dash_phase2)

    def __call__(self, video, train: bool = False, dash_phase2: bool = False):
        taps = self.encode(video, train=train, dash_phase2=dash_phase2)
        return self.decode(taps, video.shape[1], train=train,
                           dash_phase2=dash_phase2)
