"""ResNet feature-pyramid encoder for the pose/flow/appearance networks.

Counterpart of models/encoders/resnet_encoder.py:11-94: torchvision-style
ResNet-18/34/50 returning the 5-stage pyramid
[relu(conv1), layer1, layer2, layer3, layer4] with
num_ch_enc = [64, 64, 128, 256, 512] (x4 on stages 1+ for Bottleneck).
`num_input_images` widens conv1 for stacked frame pairs
(ResNetMultiImageInput :11-53).

Channels-last; BatchNorm runs in train mode with a mutable "batch_stats"
collection, matching torch BN semantics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResNetEncoder", "resnet_num_ch_enc"]

_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_BOTTLENECK = {50, 101, 152}


def resnet_num_ch_enc(num_layers: int) -> tuple[int, ...]:
    base = (64, 64, 128, 256, 512)
    if num_layers in _BOTTLENECK:
        return (64,) + tuple(c * 4 for c in base[1:])
    return base


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)
        # torch 3x3/s2 convs pad (1,1) on both sides; flax 'SAME' pads (0,1)
        # on even extents, shifting the taps (full-model parity tests).
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = bn("bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = bn("downsample_bn")(x)
        return jax.nn.relu(y + x)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4*features
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)
        out_ch = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = bn("downsample_bn")(x)
        return jax.nn.relu(y + x)


class ResNetEncoder(nn.Module):
    """__call__(x [B,H,W,3*num_input_images]) -> list of 5 feature maps."""

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = _Bottleneck if self.num_layers in _BOTTLENECK else _BasicBlock
        layers = _LAYERS[self.num_layers]

        features = []
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = jax.nn.relu(y)
        features.append(y)

        # maxpool 3x3 stride 2 pad 1
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

        widths = (64, 128, 256, 512)
        for stage, (width, nblocks) in enumerate(zip(widths, layers), start=1):
            for b in range(nblocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                y = block_cls(width, stride, self.dtype, name=f"layer{stage}_{b}")(y, train)
            features.append(y)
        return features
