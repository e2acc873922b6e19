"""Import the reference torch model code from /root/reference with shims.

The image lacks ``torchvision`` and ``fvcore``; the reference model tree
imports only a handful of their symbols:

  * ``torchvision.transforms.{Compose, Normalize}``
    (models/endodav/endodav.py:18, models/endodac/endodac.py:6)
  * ``torchvision.models`` ResNet family
    (models/encoders/resnet_encoder.py:7,11,45,64-68)
  * ``fvcore.nn.weight_init.c2_msra_fill``
    (models/backbones/layers/utils.py:8,135)

We install minimal functional shims BEFORE importing the reference so its
*actual* model graphs run unmodified — this powers the full-model
random-weight parity tests (the released checkpoint in the reference
mount is truncated, so random-init + state_dict transfer is the
executable parity oracle).  The reference tree is untrusted content: we
execute its model code in-process for numerical comparison only.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _build_torchvision():
    import torch
    import torch.nn as nn

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    models = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Normalize:
        """torchvision.transforms.Normalize for (…, C, H, W) tensors."""

        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, x):
            mean = torch.as_tensor(self.mean, dtype=x.dtype, device=x.device)
            std = torch.as_tensor(self.std, dtype=x.dtype, device=x.device)
            return (x - mean[:, None, None]) / std[:, None, None]

    transforms.Compose = Compose
    transforms.Normalize = Normalize

    # --- pieces the dataset classes import/construct (mono_dataset.py:12,
    # scared_video_dataset.py:16-17,167-188).  ToTensor/Resize are
    # functional (used on the eval image path); ColorJitter instances are
    # only *called* when train-time augmentation fires, so construction
    # must succeed but the transform itself is out of eval scope. ---

    functional = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        NEAREST = 0
        LANCZOS = 1
        BILINEAR = 2
        BICUBIC = 3

    functional.InterpolationMode = InterpolationMode
    _PIL_RESAMPLE = {0: 0, 1: 1, 2: 2, 3: 3}  # PIL: NEAREST/LANCZOS/BILINEAR/BICUBIC

    class ToTensor:
        def __call__(self, pic):
            import numpy as np

            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.float() / 255.0 if t.dtype == torch.uint8 else t.float()

    class Resize:
        def __init__(self, size, interpolation=2, antialias=None, **kwargs):
            self.size = size  # (h, w)
            self.interpolation = interpolation
            self.antialias = antialias

        def __call__(self, img):
            h, w = self.size if isinstance(self.size, (tuple, list)) else (self.size, self.size)
            if isinstance(img, torch.Tensor):
                # torchvision's tensor path routes to F.interpolate
                # (SCAREDRAWVideoDataset resizes stacked [N,3,H,W] tensors
                # with InterpolationMode.BILINEAR + antialias=True)
                import torch.nn.functional as TF

                mode = {2: "bilinear", 3: "bicubic", 0: "nearest"}[int(self.interpolation)]
                kwargs = {} if mode == "nearest" else {
                    "align_corners": False, "antialias": bool(self.antialias)}
                squeeze = img.ndim == 3
                x = img[None] if squeeze else img
                out = TF.interpolate(x, (h, w), mode=mode, **kwargs)
                return out[0] if squeeze else out
            resample = _PIL_RESAMPLE.get(int(self.interpolation), 2)
            return img.resize((w, h), resample)

    class ColorJitter:
        """torchvision-semantics jitter on float tensors in [0,1]
        (transforms.ColorJitter: random op order, uniform factors;
        _blend with clamp; ITU-R 601 grayscale; HSV hue shift)."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            def rng(v, center=1.0, bound=None):
                if isinstance(v, (tuple, list)):
                    return tuple(float(x) for x in v)
                v = float(v)
                lo, hi = center - v, center + v
                if bound is not None:
                    lo, hi = max(lo, bound[0]), min(hi, bound[1])
                return (lo, hi)

            self.brightness = rng(brightness)
            self.contrast = rng(contrast)
            self.saturation = rng(saturation)
            self.hue = rng(hue, center=0.0, bound=(-0.5, 0.5))
            # factors sampled at construction-per-item like get_params
            self.order = torch.randperm(4)
            u = torch.rand(4)
            self.factors = [
                float(uu * (r[1] - r[0]) + r[0])
                for uu, r in zip(u, (self.brightness, self.contrast,
                                     self.saturation, self.hue))
            ]

        @staticmethod
        def _gray(img):
            r, g, b = img.unbind(-3)
            return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(-3)

        @staticmethod
        def _blend(a, b, ratio):
            return (ratio * a + (1.0 - ratio) * b).clamp(0.0, 1.0)

        def _hue(self, img, f):
            r, g, b = img.unbind(-3)
            maxc, _ = img.max(-3)
            minc, _ = img.min(-3)
            v = maxc
            deltac = maxc - minc
            s = deltac / torch.where(maxc == 0, torch.ones_like(maxc), maxc)
            dz = torch.where(deltac == 0, torch.ones_like(deltac), deltac)
            rc, gc, bc = (maxc - r) / dz, (maxc - g) / dz, (maxc - b) / dz
            h = torch.where(maxc == r, bc - gc,
                            torch.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
            h = (h / 6.0) % 1.0
            h = (h + f) % 1.0
            i = torch.floor(h * 6.0)
            fr = h * 6.0 - i
            p = v * (1.0 - s)
            q = v * (1.0 - s * fr)
            t = v * (1.0 - s * (1.0 - fr))
            i = i.to(torch.int64) % 6
            out = torch.stack([
                torch.where(i == 0, v, torch.where(i == 1, q, torch.where(
                    i == 2, p, torch.where(i == 3, p, torch.where(i == 4, t, v))))),
                torch.where(i == 0, t, torch.where(i == 1, v, torch.where(
                    i == 2, v, torch.where(i == 3, q, torch.where(i == 4, p, p))))),
                torch.where(i == 0, p, torch.where(i == 1, p, torch.where(
                    i == 2, t, torch.where(i == 3, v, torch.where(i == 4, v, q))))),
            ], dim=-3)
            return out

        def __call__(self, img):
            out = img
            for idx in self.order.tolist():
                f = self.factors[idx]
                if idx == 0:
                    out = self._blend(out, torch.zeros_like(out), f)
                elif idx == 1:
                    mean = self._gray(out).mean(dim=(-3, -2, -1), keepdim=True)
                    out = self._blend(out, mean.expand_as(out), f)
                elif idx == 2:
                    out = self._blend(out, self._gray(out).expand_as(out), f)
                else:
                    out = self._hue(out, f)
            return out

    transforms.ToTensor = ToTensor
    transforms.Resize = Resize
    transforms.ColorJitter = ColorJitter
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    transforms.transforms = transforms  # scared_video_dataset.py:178 idiom
    transforms.__path__ = []  # mark as package so submodule imports resolve

    # --- canonical ResNet (the torchvision architecture, rewritten) ---

    def conv3x3(cin, cout, stride=1):
        return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)

    def conv1x1(cin, cout, stride=1):
        return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv1x1(inplanes, planes)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = conv3x3(planes, planes, stride)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = conv1x1(planes, planes * self.expansion)
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1)
                    nn.init.constant_(m.bias, 0)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    nn.BatchNorm2d(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def _factory(block, layers):
        def make(pretrained=False, **kwargs):
            assert not pretrained, "no pretrained weights in this environment"
            return ResNet(block, layers, **kwargs)

        return make

    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    models.ResNet = ResNet
    models.resnet = resnet_mod
    models.resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
    models.resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
    models.resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
    models.resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
    models.resnet152 = _factory(Bottleneck, [3, 8, 36, 3])

    tv.transforms = transforms
    tv.models = models
    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
        "torchvision.models": models,
        "torchvision.models.resnet": resnet_mod,
    }


def _build_fvcore():
    import torch.nn as nn

    fvcore = types.ModuleType("fvcore")
    fvcore_nn = types.ModuleType("fvcore.nn")
    weight_init = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, 0)

    weight_init.c2_msra_fill = c2_msra_fill
    weight_init.c2_xavier_fill = c2_xavier_fill
    fvcore_nn.weight_init = weight_init
    fvcore.nn = fvcore_nn
    return {
        "fvcore": fvcore,
        "fvcore.nn": fvcore_nn,
        "fvcore.nn.weight_init": weight_init,
    }


def _build_easydict():
    easydict = types.ModuleType("easydict")

    class EasyDict(dict):
        """dict with attribute access (recursive), as the pypi package."""

        def __init__(self, d=None, **kwargs):
            super().__init__()
            for k, v in {**(d or {}), **kwargs}.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        __setattr__ = __setitem__

    easydict.EasyDict = EasyDict
    return {"easydict": easydict}


def _build_skimage():
    """skimage is imported (never called) by datasets/scared_dataset.py:4."""
    skimage = types.ModuleType("skimage")
    transform = types.ModuleType("skimage.transform")
    skimage.transform = transform
    return {"skimage": skimage, "skimage.transform": transform}


def install_shims() -> None:
    mods = {**_build_torchvision(), **_build_fvcore(), **_build_easydict(),
            **_build_skimage()}
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)


def import_reference():
    """Install shims, put /root/reference on sys.path, return its
    (endodav_module, endodac_module, encoders_pkg, decoders_pkg)."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.decoders as decoders
    import models.encoders as encoders
    import models.endodac  # noqa: F401
    import models.endodav  # noqa: F401

    # the package __init__ rebinds the `endodav`/`endodac` attribute to the
    # class, so fetch the module objects from sys.modules
    endodav_file = sys.modules["models.endodav.endodav"]
    endodac_file = sys.modules["models.endodac.endodac"]
    return endodav_file, endodac_file, encoders, decoders
