"""On-device color jitter + training pyramid.

Device-exact counterpart of the host preprocessing in `data/pipeline.py`
(itself mirroring torchvision ColorJitter + cascaded antialiased resize,
datasets/scared_video_dataset.py:204-218): the same interpolation
matrices (`ops.resize.interp_matrix`) and the same jitter math run in
jnp, so shipping only the scale-0 tensors + jitter parameters to the
device reproduces the host pipeline bit-for-bit (f32) while cutting
host->device traffic ~2.7x and freeing the (single-core) host loader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from endodav_tpu.ops.resize import resize2d

__all__ = ["device_color_jitter", "device_pyramid"]


def _grayscale(img):
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def _brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _contrast(img, f):
    mean = _grayscale(img).mean()
    return jnp.clip((img - mean) * f + mean, 0.0, 1.0)


def _saturation(img, f):
    gray = _grayscale(img)[..., None]
    return jnp.clip((img - gray) * f + gray, 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hue(img, f):
    hsv = _rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + f) % 1.0)
    return _hsv_to_rgb(hsv)


def device_color_jitter(img: jnp.ndarray, order: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """Apply one item's jitter to [..., H, W, 3] float images in [0,1].

    order: int32[4] permutation over {brightness, contrast, saturation,
    hue}; factors: f32[4] matching that fixed op indexing (the host
    `sample_color_jitter` layout).
    """

    def step(k, x):
        op = order[k]
        return jax.lax.switch(
            op,
            [
                lambda y: _brightness(y, factors[0]),
                lambda y: _contrast(y, factors[1]),
                lambda y: _saturation(y, factors[2]),
                # hue 0 short-circuits so identity jitter (no-aug items)
                # is exact — the HSV round-trip isn't bit-exact
                lambda y: jax.lax.cond(factors[3] == 0.0, lambda z: z, lambda z: _hue(z, factors[3]), y),
            ],
            x,
        )

    return jax.lax.fori_loop(0, 4, step, img)


def device_pyramid(scale0: jnp.ndarray, num_scales: int, order=None, factors=None):
    """Cascaded antialiased pyramid (+ optional per-scale jitter).

    scale0: [N, H, W, 3] float32 — the host-resized scale-0 frames.
    Returns (colors per scale, jittered colors per scale); when
    order/factors are None the aug copies equal the colors (no-aug items
    mirror the host pipeline's identity jitter).
    """
    colors, colors_aug = [], []
    cur = scale0
    h, w = scale0.shape[1:3]
    for s in range(num_scales):
        if s > 0:
            cur = resize2d(cur, (h // 2 ** s, w // 2 ** s), "bilinear",
                           align_corners=False, antialias=True)
        colors.append(cur)
        if order is None:
            colors_aug.append(cur)
        else:
            colors_aug.append(device_color_jitter(cur, order, factors))
    return tuple(colors), tuple(colors_aug)
