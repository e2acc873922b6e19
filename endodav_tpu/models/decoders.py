"""Pose / intrinsics / optical-flow / appearance-flow / depth decoders.

Counterparts of models/decoders/ (SURVEY.md §2.1):
  * PoseDecoder (pose_decoder.py:54-96): squeeze 1x1 -> 3 convs ->
    mean-pool -> 0.001 * 6-DoF for 2 frames, plus the intermediate
    feature tap consumed by the intrinsics head
  * IntrinsicsHead (intrinsics_decoder.py:4-36): global-pool pose feature
    -> softplus focal (+0.5, scaled by W/H) and offsets -> 4x4 K
  * PositionDecoder (optical_flow_decoder.py:66-116): monodepth U-Net over
    ResNet features -> 2-ch flow at 4 scales, flow convs init N(0, 1e-5)
  * TransformDecoder (appearance_flow_decoder.py:61-108): same U-Net ->
    3-ch tanh appearance flow
  * DepthDecoder (depth_decoder.py:67-114): monodepth2 sigmoid disparity
    U-Net (legacy afsfm path)
  * PoseCNN (pose_cnn.py:7-44): 7-conv PoseNet alternative

All channels-last; U-Net upsampling uses the same nearest-free bilinear
(align_corners=False) as torch's F.interpolate default (utils/layers.py:216).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from endodav_tpu.ops.resize import resize2d

__all__ = [
    "PoseDecoder",
    "IntrinsicsHead",
    "PositionDecoder",
    "TransformDecoder",
    "DepthDecoder",
    "PoseCNN",
]


class _ReflectConvBlock(nn.Module):
    """3x3 conv with reflection padding + ELU (utils/layers.py:101-131).

    The reflect pad stays the explicit jnp.pad: a round-4 experiment
    replaced it with a zero-SAME conv + recomputed 1-px border strips
    (exact, bitwise-equal) expecting to drop the padded-copy bandwidth
    (73 ms/step attributed to these pads in the device profile), but
    the whole step moved only 749 -> 740 ms while convolution fusions
    grew +25 ms — XLA already fuses the pad into the conv, so the
    attribution was pad+conv fusions, not removable pad cost — and the
    extra strip ops inflated CPU compile times badly.  Measured
    negative; recorded in PERFORMANCE.md "Round 4"."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype, name="conv")(x)
        return jax.nn.elu(x)


class _ReflectConv3x3(nn.Module):
    features: int
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = {}
        if self.kernel_init is not None:
            kw["kernel_init"] = self.kernel_init
        if self.bias_init is not None:
            kw["bias_init"] = self.bias_init
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype, name="conv", **kw)(x)


class PoseDecoder(nn.Module):
    """Returns (axisangle [B, F, 1, 3], translation [B, F, 1, 3],
    intermediate_feature [B, h, w, 256])."""

    num_frames_to_predict_for: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        last = features[-1]
        x = jax.nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(last))
        x = nn.Conv(256, (3, 3), dtype=self.dtype, name="pose_0")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(256, (3, 3), dtype=self.dtype, name="pose_1")(x)
        intermediate = x
        x = jax.nn.relu(x)
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype, name="pose_2")(x)
        x = x.mean(axis=(1, 2))
        out = 0.001 * x.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:], intermediate


class IntrinsicsHead(nn.Module):
    """Learned pinhole intrinsics from the pose decoder's mid feature."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottleneck, img_width: int, img_height: int):
        b = bottleneck.shape[0]
        pooled = bottleneck.mean(axis=(1, 2), keepdims=True)  # [B,1,1,256]
        focal = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype, name="focal_length_conv")(pooled)
        offset = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype, name="offsets_conv")(pooled)
        wh = jnp.asarray([img_width, img_height], dtype=bottleneck.dtype)
        focal = (jax.nn.softplus(focal[:, 0, 0, :]) + 0.5) * wh
        offset = (offset[:, 0, 0, :] + 0.5) * wh
        K = jnp.broadcast_to(jnp.eye(4, dtype=bottleneck.dtype), (b, 4, 4))
        K = K.at[:, 0, 0].set(focal[:, 0]).at[:, 1, 1].set(focal[:, 1])
        K = K.at[:, 0, 2].set(offset[:, 0]).at[:, 1, 2].set(offset[:, 1])
        return K


class _UNetDecoder(nn.Module):
    """Shared monodepth-style U-Net trunk over the 5-level pyramid."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    _NUM_CH_DEC = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, features):
        x = features[-1]
        level_feats = {}
        for i in range(4, -1, -1):
            x = _ReflectConvBlock(self._NUM_CH_DEC[i], self.dtype, name=f"upconv_{i}_0")(x)
            x = resize2d(x, (x.shape[1] * 2, x.shape[2] * 2), "bilinear", align_corners=False)
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = _ReflectConvBlock(self._NUM_CH_DEC[i], self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                level_feats[i] = x
        return level_feats


class PositionDecoder(nn.Module):
    """2-ch optical flow at 4 scales; flow convs init N(0, 1e-5)."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        level_feats = _UNetDecoder(self.num_ch_enc, self.scales, self.dtype, name="unet")(features)
        out = {}
        for s in self.scales:
            conv = nn.Conv(
                self.num_output_channels, (3, 3), dtype=self.dtype,
                kernel_init=nn.initializers.normal(1e-5),
                bias_init=nn.initializers.zeros,
                name=f"position_conv_{s}",
            )
            out[("position", s)] = conv(level_feats[s])
        return out


class TransformDecoder(nn.Module):
    """3-ch tanh appearance flow at 4 scales."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        level_feats = _UNetDecoder(self.num_ch_enc, self.scales, self.dtype, name="unet")(features)
        out = {}
        for s in self.scales:
            y = _ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=f"transform_conv_{s}")(
                level_feats[s]
            )
            out[("transform", s)] = jnp.tanh(y)
        return out


class DepthDecoder(nn.Module):
    """Monodepth2 sigmoid disparity U-Net (legacy afsfm model path)."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        level_feats = _UNetDecoder(self.num_ch_enc, self.scales, self.dtype, name="unet")(features)
        out = {}
        for s in self.scales:
            y = _ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{s}")(
                level_feats[s]
            )
            out[("disp", s)] = jax.nn.sigmoid(y)
        return out


class PoseCNN(nn.Module):
    """7-conv PoseNet (pose_model_type=posecnn)."""

    num_input_frames: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2), (256, 3, 2), (256, 3, 2), (256, 3, 2)]
        for i, (ch, k, s) in enumerate(specs):
            # torch pads k//2 on both sides (pose_cnn.py:16-24); 'SAME'
            # would pad asymmetrically on even extents under stride 2
            p = k // 2
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"convs_{i}")(x)
            x = jax.nn.relu(x)
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1), dtype=self.dtype, name="pose_conv")(x)
        x = x.mean(axis=(1, 2))
        out = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return out[..., :3], out[..., 3:]
