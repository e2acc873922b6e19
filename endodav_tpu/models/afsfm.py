"""Legacy AF-SfMLearner depth model (`model_type=afsfm`).

ResNet encoder + monodepth2 sigmoid-disparity U-Net, the third model
family the eval scripts accept (options.py:272-276; test_simple.py and
evaluate_depth.py route to encoder.pth + depth.pth checkpoints).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from endodav_tpu.models.decoders import DepthDecoder
from endodav_tpu.models.resnet import ResNetEncoder, resnet_num_ch_enc

__all__ = ["AFSfMDepth"]


class AFSfMDepth(nn.Module):
    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels, train: bool = False, dash_phase2: bool = False):
        if pixels.ndim == 5:
            pixels = pixels.reshape(-1, *pixels.shape[2:])
        feats = ResNetEncoder(self.num_layers, dtype=self.dtype, name="encoder")(pixels, train)
        return DepthDecoder(
            resnet_num_ch_enc(self.num_layers), tuple(self.scales), dtype=self.dtype, name="depth"
        )(feats)
