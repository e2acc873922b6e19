"""DPT decoder family — one parameterized head instead of three classes.

The reference spreads the DPT decoder across DPTHead
(models/endodav/dpt.py:47), DPTHeadTemporal (dpt_temporal.py:22),
DPTHeadPyramid (dpt_pyramid.py:22) and a second copy for single-frame
EndoDAC (models/endodac/endodac.py:14-142).  SURVEY.md §7 calls for one
module with `temporal` / head-mode flags; that is this file.

Structure (all channels-last [B, H, W, C]):
  * per-tap 1x1 projection + resize stage (4x/2x conv-transpose, identity,
    stride-2 conv) (dpt.py:60-90)
  * 3x3 "scratch" convs to a common `features` width (util/blocks.py:4-34)
  * 4 FeatureFusionBlocks: 2 residual conv units, skip-add, bilinear
    align_corners=True resize, 1x1 out conv (util/blocks.py:94-162)
  * temporal mode: TemporalModules on layer_3/layer_4 pre-fusion and
    path_4/path_3 post-fusion (dpt_temporal.py:42-86)
  * multi-scale head: HeadDepth conv stacks + sigmoid per path
    (endodav/layers.py:206-221, dpt_pyramid.py:103-109), or the single
    output-conv head with a downsampled pyramid (dpt_pyramid.py:88-102)
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from endodav_tpu.models.motion import TemporalModule
from endodav_tpu.ops.resize import resize2d
from endodav_tpu.utils.envflags import env_on

__all__ = ["DPTDecoder", "HeadDepth"]


class _ConvParams(nn.Module):
    """nn.Conv's exact param tree (kernel HWIO + bias, same names/inits),
    returned raw so ResidualConvUnit can route the math to either the
    XLA composition or the fused Pallas kernel without forking the
    checkpoint format."""

    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class ResidualConvUnit(nn.Module):
    features: int
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        w1, b1 = _ConvParams(self.features, name="conv1")(c_in)
        w2, b2 = _ConvParams(self.features, name="conv2")(self.features)

        # fused Pallas path (kernels/fused_rcu.py): inference-only, no-BN,
        # C small enough for the in-VMEM im2col panel; default OFF until
        # the device A/B (agenda stage `rcu`) says otherwise.  NOTE: the
        # except below covers trace-time failures only — a Mosaic
        # lowering/VMEM error surfaces at whole-model COMPILE time, where
        # the remedy is unsetting the flag (the A/B stage tolerates a
        # failed leg).
        from endodav_tpu.ops.quant import env_on

        use_fused = (
            not self.use_bn and not train
            and self.features <= 128 and c_in == self.features
            and jax.default_backend() == "tpu"
            and env_on("ENDODAV_FUSED_RCU")
        )
        if use_fused:
            try:
                from endodav_tpu.kernels.fused_rcu import fused_rcu

                return fused_rcu(x, w1, b1, w2, b2)
            except Exception as e:
                import warnings

                warnings.warn(
                    f"endodav_tpu: Pallas fused_rcu failed at trace time "
                    f"({type(e).__name__}: {e}); falling back to XLA convs",
                    RuntimeWarning)

        from endodav_tpu.kernels.fused_rcu import rcu_reference

        if not self.use_bn:
            # skip=x keeps the historical output-dtype promotion
            # (y [self.dtype] + x [input dtype]) of the nn.Conv stack
            return rcu_reference(x.astype(self.dtype), w1, b1, w2, b2, skip=x)

        dn = ("NHWC", "HWIO", "NHWC")
        conv = lambda v, w, b: jax.lax.conv_general_dilated(
            v, w.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=dn) + b.astype(self.dtype)
        y = jax.nn.relu(x.astype(self.dtype))
        y = conv(y, w1, b1)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = jax.nn.relu(y)
        y = conv(y, w2, b2)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        return y + x


class FeatureFusionBlock(nn.Module):
    """Fuse an optional skip, refine, upsample (align_corners=True), 1x1.

    The reference applies the 1x1 ``out_conv`` AFTER the bilinear upsample
    (util/blocks.py:94-162).  A 1x1 conv acts on channels only and the
    separable bilinear resize acts on space only, so the two commute
    exactly (tensor product of linear maps) and running ``out_conv`` at
    the LOW resolution does ~4x less conv work — but the device A/B
    (tools/tpu_session_r3.sh stage `outconv`, whole-model 6-iter medians)
    measured the reference order FASTER at every leg: 518px 271.2 vs
    280.8 ms, 224x280 119.8 vs 125.6 ms (fused temporal; unfused legs
    agree) — XLA fuses the 1x1 into the high-res resize einsum's output,
    while the commuted order forces an extra low-res layout pass.  The
    reference order is therefore the default; ``ENDODAV_LOWRES_OUTCONV=1``
    selects the commuted order (weights/params identical either way).
    """

    features: int
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, size: tuple[int, int] | None = None, train: bool = False):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.use_bn, self.dtype, name="resConfUnit1")(skip, train)
        x = ResidualConvUnit(self.features, self.use_bn, self.dtype, name="resConfUnit2")(x, train)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        out_conv = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")
        if env_on("ENDODAV_LOWRES_OUTCONV"):
            x = out_conv(x)
            return resize2d(x, size, "bilinear", align_corners=True)
        x = resize2d(x, size, "bilinear", align_corners=True)
        return out_conv(x)


class HeadDepth(nn.Module):
    """conv3x3 -> 2x bilinear (AC=True) -> conv3x3 -> relu -> conv1x1
    (endodav/layers.py:206-221); raw logits, caller applies sigmoid."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features // 2, (3, 3), dtype=self.dtype, name="conv0")(x)
        x = resize2d(x, (x.shape[1] * 2, x.shape[2] * 2), "bilinear", align_corners=True)
        x = nn.Conv(32, (3, 3), dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(x)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="conv4")(x)


class _OutputConvHead(nn.Module):
    """The VDA-style single head: 3x3 -> upsample to 14*patch -> 3x3 ->
    relu -> 1x1 -> relu (dpt.py:114-124).  ``out_hw`` travels as a call
    argument (static shapes) so the module can live in a setup() tree
    whose input extents aren't known at construction.  The ``out_hw``
    field is retained only as a default."""

    features: int
    out_hw: tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw: tuple[int, int] | None = None):
        oh, ow = out_hw if out_hw is not None else self.out_hw
        x = nn.Conv(self.features // 2, (3, 3), dtype=self.dtype, name="output_conv1")(x)
        x = resize2d(x, (oh, ow), "bilinear", align_corners=True)
        x = nn.Conv(32, (3, 3), dtype=self.dtype, name="output_conv2_0")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        return jax.nn.relu(x)


class DPTDecoder(nn.Module):
    """DPT fusion decoder over 4 ViT taps -> multi-scale sigmoid disparity.

    __call__(taps, patch_hw, frames) with taps = list of (tokens [BT,N,C],
    cls [BT,C]) and returns {("disp", s): [BT, h_s, w_s, 1]} for s=0..3.

    Split into ``prefix`` (strictly PER-FRAME: readout/projections,
    resize stages, layer1/2 rn convs — everything before the first
    temporal module) and ``suffix`` (temporal modules + fusion pyramid +
    heads).  ``__call__`` composes them, so the whole-model graph and
    param tree are unchanged; the dedup serving pipeline calls them
    separately to run the prefix ONCE per unique source frame instead of
    once per window slot (~2x duplicate work on the sliding window's
    OVERLAP carries, measured ~14 ms of a 128-slot 518px head chunk —
    the same argument that dedups the ViT trunk, eval/video_inference.py).
    Setup-style (not nn.compact) so both halves share one parameter
    declaration; attribute/container names reproduce the exact param
    tree of the previous compact form.
    """

    in_channels: int
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    use_bn: bool = False
    use_clstoken: bool = False
    temporal: bool = False
    num_frames: int = 32
    pos_embedding_type: str = "ape"
    conv_head: bool = True          # False => disable_conv_head path
    inv_sigmoid: bool = False
    out_sigmoid: bool = False
    temporal_lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.use_clstoken:
            self.readout_projects = [
                nn.Dense(self.in_channels, dtype=self.dtype) for _ in range(4)]
        self.projects = [
            nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype)
            for i in range(4)]
        # torch Conv2d(k=3, s=2, padding=1) pads (1,1) on BOTH sides for
        # resize_layers_3; flax 'SAME' would pad (0,1) on even extents and
        # shift the taps by one pixel (caught by full-model parity tests).
        self.resize_layers = {
            "0": nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4),
                                  dtype=self.dtype, transpose_kernel=True),
            "1": nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2),
                                  dtype=self.dtype, transpose_kernel=True),
            "3": nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype),
        }
        if self.temporal:
            motion = lambda ch: TemporalModule(
                ch, temporal_max_len=self.num_frames,
                pos_embedding_type=self.pos_embedding_type,
                lora_variant=self.temporal_lora_variant, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype,
            )
            self.motion_modules = [
                motion(self.out_channels[2]), motion(self.out_channels[3]),
                motion(self.features), motion(self.features)]
        rn = lambda: nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)
        self.layer1_rn, self.layer2_rn = rn(), rn()
        self.layer3_rn, self.layer4_rn = rn(), rn()
        fuse = lambda: FeatureFusionBlock(self.features, self.use_bn, self.dtype)
        self.refinenet1, self.refinenet2 = fuse(), fuse()
        self.refinenet3, self.refinenet4 = fuse(), fuse()
        if self.conv_head:
            self.conv_depth = {str(i): HeadDepth(self.features, self.dtype)
                               for i in (1, 2, 3, 4)}
        else:
            self.scratch_output = _OutputConvHead(
                self.features, (0, 0), self.dtype)

    def prefix(self, taps, patch_hw: tuple[int, int],
               dash_phase2: bool = False):
        """Per-frame front half: taps -> (layer_1_rn, layer_2_rn,
        layer_3, layer_4).  No op here mixes frames, so the dedup
        pipeline runs it once per unique source frame."""
        ph, pw = patch_hw
        assert len(taps) == 4

        maps = []
        for i, tap in enumerate(taps):
            tokens, cls = tap
            bt, n, c = tokens.shape
            if self.use_clstoken:
                readout = jnp.broadcast_to(cls[:, None, :], tokens.shape)
                x = jnp.concatenate([tokens, readout], axis=-1)
                x = self.readout_projects[i](x)
                x = jax.nn.gelu(x, approximate=False)
            else:
                x = tokens
            x = x.reshape(bt, ph, pw, c)
            x = self.projects[i](x)
            if str(i) in self.resize_layers:
                x = self.resize_layers[str(i)](x)
            maps.append(x)

        layer_1, layer_2, layer_3, layer_4 = maps
        # layer_3/layer_4 rn convs run AFTER their temporal modules
        # (dpt_temporal.py:75-86) and stay in the suffix
        return (self.layer1_rn(layer_1), self.layer2_rn(layer_2),
                layer_3, layer_4)

    def suffix(self, maps, frames: int = 1, train: bool = False,
               dash_phase2: bool = False):
        """Window half: temporal modules + fusion pyramid + heads."""
        layer_1_rn, layer_2_rn, layer_3, layer_4 = maps

        if self.temporal:
            layer_3 = self.motion_modules[0](layer_3, frames, dash_phase2, train)
            layer_4 = self.motion_modules[1](layer_4, frames, dash_phase2, train)

        layer_3_rn = self.layer3_rn(layer_3)
        layer_4_rn = self.layer4_rn(layer_4)

        path_4 = self.refinenet4(layer_4_rn, None, layer_3_rn.shape[1:3], train)
        if self.temporal:
            path_4 = self.motion_modules[2](path_4, frames, dash_phase2, train)
        path_3 = self.refinenet3(path_4, layer_3_rn, layer_2_rn.shape[1:3], train)
        if self.temporal:
            path_3 = self.motion_modules[3](path_3, frames, dash_phase2, train)
        path_2 = self.refinenet2(path_3, layer_2_rn, layer_1_rn.shape[1:3], train)
        path_1 = self.refinenet1(path_2, layer_1_rn, None, train)

        out = {}
        if self.conv_head:
            sign = -1.0 if self.inv_sigmoid else 1.0
            out[("disp", 3)] = jax.nn.sigmoid(sign * self.conv_depth["4"](path_4))
            out[("disp", 2)] = jax.nn.sigmoid(sign * self.conv_depth["3"](path_3))
            out[("disp", 1)] = jax.nn.sigmoid(sign * self.conv_depth["2"](path_2))
            out[("disp", 0)] = jax.nn.sigmoid(sign * self.conv_depth["1"](path_1))
        else:
            # upsample to 14x the patch grid (derived from layer_1_rn's
            # 4x-of-patch-grid extent; the compact form used patch_hw)
            out_hw = (layer_1_rn.shape[1] * 14 // 4, layer_1_rn.shape[2] * 14 // 4)
            y = self.scratch_output(path_1, out_hw)
            out[("disp", 0)] = y
            for s in range(1, 4):
                prev = out[("disp", s - 1)]
                out[("disp", s)] = resize2d(
                    prev, (prev.shape[1] // 2, prev.shape[2] // 2), "bilinear", align_corners=True
                )
            if self.out_sigmoid:
                for s in range(4):
                    out[("disp", s)] = jax.nn.sigmoid(out[("disp", s)])
        return out

    def __call__(self, taps, patch_hw: tuple[int, int], frames: int = 1,
                 train: bool = False, dash_phase2: bool = False):
        maps = self.prefix(taps, patch_hw, dash_phase2)
        return self.suffix(maps, frames, train, dash_phase2)
