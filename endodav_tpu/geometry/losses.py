"""Photometric / smoothness / correlation losses (channels-last, pure jnp).

Functional counterparts of the reference loss library (utils/layers.py:
SSIM:276, get_smooth_loss:222, get_smooth_bright:239,
get_smooth_registration:266, ncc_loss:309, BerHuLoss:608) plus the
0.85*SSIM + 0.15*L1 reprojection loss assembled in the trainer
(trainer_end_to_end_video.py:900-911).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "ssim",
    "reprojection_loss",
    "smooth_loss",
    "smooth_bright",
    "smooth_registration",
    "ncc",
    "berhu",
]


def _avg_pool3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 mean pool after 1px reflection pad; x: [B, H, W, C]."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM distance in [0, 1]; inputs [B, H, W, C]."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x = _avg_pool3_reflect(x)
    mu_y = _avg_pool3_reflect(y)
    sigma_x = _avg_pool3_reflect(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3_reflect(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3_reflect(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)


def reprojection_loss(pred, target, use_ssim: bool = True):
    """0.85*SSIM + 0.15*L1 per-pixel loss, averaged over channels -> [B,H,W,1]."""
    l1 = jnp.abs(target - pred).mean(axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    s = ssim(pred, target).mean(axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def smooth_loss(disp, img):
    """Edge-aware first-order disparity smoothness; inputs [B, H, W, C]."""
    gdx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    gdy = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    gix = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).mean(-1, keepdims=True)
    giy = jnp.abs(img[:, :-1, :] - img[:, 1:, :]).mean(-1, keepdims=True)
    return (gdx * jnp.exp(-gix)).mean() + (gdy * jnp.exp(-giy)).mean()


def smooth_bright(transform, target, pred, occu_mask):
    """Residue-aware appearance-flow smoothness (utils/layers.py:239-263)."""
    gtx = jnp.abs(transform[:, :, :-1] - transform[:, :, 1:]).mean(-1, keepdims=True)
    gty = jnp.abs(transform[:, :-1, :] - transform[:, 1:, :]).mean(-1, keepdims=True)
    residue = target - pred
    grx = jnp.abs(residue[:, :, :-1] - residue[:, :, 1:]).mean(-1, keepdims=True)
    gry = jnp.abs(residue[:, :-1, :] - residue[:, 1:, :]).mean(-1, keepdims=True)
    mask_x = occu_mask[:, :, :-1]
    mask_y = occu_mask[:, :-1, :]
    gtx = gtx * jnp.exp(-grx) * mask_x
    gty = gty * jnp.exp(-gry) * mask_y
    return gtx.sum() / mask_x.sum() + gty.sum() / mask_y.sum()


def smooth_registration(position):
    """First-order flow smoothness without edge weighting."""
    gx = jnp.abs(position[:, :, :-1] - position[:, :, 1:])
    gy = jnp.abs(position[:, :-1, :] - position[:, 1:, :])
    return gx.mean() + gy.mean()


def ncc(i, j, win: int = 5):
    """Negative local normalized cross-correlation map; inputs [B, H, W, 1]."""
    pad = win // 2
    ones = jnp.ones((win, win, 1, 1), dtype=i.dtype)

    def box(x):
        return jax.lax.conv_general_dilated(
            x, ones, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    i2, j2, ij = i * i, j * j, i * j
    i_sum, j_sum = box(i), box(j)
    i2_sum, j2_sum, ij_sum = box(i2), box(j2), box(ij)
    n = float(win * win)
    u_i, u_j = i_sum / n, j_sum / n
    cross = ij_sum - u_j * i_sum - u_i * j_sum + u_i * u_j * n
    i_var = i2_sum - 2 * u_i * i_sum + u_i * u_i * n
    j_var = j2_sum - 2 * u_j * j_sum + u_j * u_j * n
    cc = cross * cross / (i_var * j_var + 1e-5)
    return -cc


def berhu(pred, target):
    """Reverse Huber loss (utils/layers.py:608-624)."""
    diff = pred - target
    abs_diff = jnp.abs(diff)
    c = 0.2 * jax.lax.stop_gradient(abs_diff.max())
    l2 = (diff ** 2 + c ** 2) / (2.0 * c)
    return jnp.where(abs_diff <= c, abs_diff, l2).mean()
