"""Off-main-path geometry utilities kept for inventory completeness.

Counterparts of the remaining utils/layers.py pieces that no training or
eval path consumes but the reference exposes: `project_raw_pixels`
(Project3D_Raw :192-213), `flow_match` (match :522-540), `texture_mask`
(get_texu_mask :543-549) and `reduced_ransac` (:627-683 — cv2
fundamental-matrix RANSAC over top-scoring flow matches; host-side by
nature).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["project_raw_pixels", "flow_match", "texture_mask", "reduced_ransac"]

_HI = jax.lax.Precision.HIGHEST


def project_raw_pixels(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Unnormalized projected pixel coords [B, H, W, 2] (x, y)."""
    b = points.shape[0]
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)
    xy = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    return xy.reshape(b, 2, height, width).transpose(0, 2, 3, 1)


def flow_match(flow: jnp.ndarray) -> jnp.ndarray:
    """Stack (source xy, target xy) match maps [B, H, W, 4] from a (dy, dx)
    flow field (utils/layers.py:522-540)."""
    b, h, w, _ = flow.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij")
    src = jnp.broadcast_to(jnp.stack([xx, yy], axis=-1)[None], (b, h, w, 2))
    tgt = jnp.stack([xx[None] + flow[..., 1], yy[None] + flow[..., 0]], axis=-1)
    return jnp.concatenate([src, tgt], axis=-1)


def texture_mask(non_rigid: jnp.ndarray, rigid: jnp.ndarray) -> jnp.ndarray:
    """Rigid-vs-nonrigid flow agreement mask (utils/layers.py:543-549)."""
    diff = ((non_rigid - rigid) ** 2).mean(axis=-1, keepdims=True)
    total = 0.01 * ((non_rigid ** 2).mean(-1, keepdims=True) + (rigid ** 2).mean(-1, keepdims=True)) + 0.5
    return (diff < total).astype(non_rigid.dtype)


def reduced_ransac(match: np.ndarray, mask: np.ndarray, check_num: int = 6000,
                   dataset: str = "scared", top_ratio: float = 0.20,
                   rng: np.random.Generator | None = None) -> np.ndarray:
    """Fundamental matrices from flow matches via cv2 RANSAC (host-side).

    match: [B, H, W, 4] (src xy, tgt xy); mask: [B, H, W, 1] scores.
    Returns [B, 3, 3].
    """
    import cv2

    rng = rng or np.random.default_rng(0)
    b = match.shape[0]
    match_flat = match.reshape(b, -1, 4)
    mask_flat = mask.reshape(b, -1)

    out = []
    for i in range(b):
        scores = mask_flat[i]
        k = max(8, int(top_ratio * scores.shape[0]))
        top_idx = np.argpartition(-scores, k - 1)[:k]
        pick = top_idx[rng.integers(0, len(top_idx), size=min(check_num, len(top_idx)))]
        pts = match_flat[i][pick]
        if dataset == "nyuv2":
            f, _ = cv2.findFundamentalMat(pts[:, :2], pts[:, 2:], cv2.FM_LMEDS, 0.99)
        else:
            f, _ = cv2.findFundamentalMat(pts[:, :2], pts[:, 2:], cv2.FM_RANSAC, 0.1, 0.99)
        out.append(np.eye(3, dtype=np.float64) if f is None else f[:3])
    return np.stack(out, axis=0)
