from .afsfm import AFSfMDepth
from .endodac import ENDODAC_CONFIGS, EndoDAC
from .endodav import ENDODAV_CONFIGS, INFER_LEN, INTERP_LEN, KEYFRAMES, OVERLAP, EndoDAV
from .lora import LoRADense, dash_svd_update
from .vit import VIT_CONFIGS, DinoViT

__all__ = [
    "AFSfMDepth",
    "ENDODAC_CONFIGS",
    "EndoDAC",
    "ENDODAV_CONFIGS",
    "EndoDAV",
    "INFER_LEN",
    "INTERP_LEN",
    "KEYFRAMES",
    "OVERLAP",
    "LoRADense",
    "dash_svd_update",
    "VIT_CONFIGS",
    "DinoViT",
]
