"""On-device TAE/TAS temporal-consistency metrics.

The reference computes TAE/TAS in per-frame numpy on the CPU
(utils/eval_utils.py:64-143) — at full SCARED resolution that is the
slowest part of an eval epoch.  This module vectorizes the whole
unproject -> rigid transform -> nearest-pixel splat -> masked metric
chain in jnp so all frame pairs of a sequence run as one jit call.

Semantics match `eval.metrics.tae/tas` exactly: +0.5 pixel centers,
z > 1e-6 gating, `round`-to-nearest target pixel, last-write-wins splat
(realized deterministically via a max-index scatter so results do not
depend on scatter ordering: numpy's sequential splat keeps the LAST
point written to a pixel, so we select the highest linear point index
per pixel), symmetric mean of the two directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["temporal_metrics_sequence"]


def _reproject_one(depth_src, mask_src, i2l_src, mask_tgt, l2i_tgt):
    """Splat depth_src's points into the target view (z-buffer-free,
    last-write-wins parity with eval_utils.py:80-101)."""
    h, w = depth_src.shape
    ys, xs = jnp.meshgrid(
        jnp.linspace(0.5, h - 0.5, h), jnp.linspace(0.5, w - 0.5, w), indexing="ij"
    )
    pts = jnp.stack([xs * depth_src, ys * depth_src, depth_src, jnp.ones_like(xs)], axis=-1)
    pts = pts.reshape(-1, 4) @ i2l_src.T  # lidar frame
    pts = pts @ l2i_tgt.T                 # target image frame
    z = pts[:, 2]
    eps = 1e-6
    ok = (z > eps) & mask_src.reshape(-1)
    cam = pts[:, :2] / jnp.clip(pts[:, 2:3], eps, None)
    coords = jnp.round(cam).astype(jnp.int32)
    ok &= (coords[:, 0] >= 0) & (coords[:, 0] < w) & (coords[:, 1] >= 0) & (coords[:, 1] < h)
    lin = jnp.where(ok, coords[:, 1] * w + coords[:, 0], h * w)  # OOB bucket

    # last-write-wins: numpy writes points in raster order, so the last
    # (highest-index) point landing on a pixel wins.  Scatter-max the
    # point index per pixel, then gather that point's depth.
    order = jnp.arange(lin.shape[0], dtype=jnp.int32)
    winner = jnp.full((h * w + 1,), -1, jnp.int32).at[lin].max(jnp.where(ok, order, -1))
    winner = winner[: h * w]
    has = winner >= 0
    depth_out = jnp.where(has, z[jnp.clip(winner, 0)], 0.0)
    return (depth_out.reshape(h, w) * mask_tgt).astype(jnp.float32)


def _directional(depth_a, mask_a, i2l_a, depth_b, mask_b, l2i_b):
    a2b = _reproject_one(depth_a, mask_a, i2l_a, mask_b, l2i_b)
    m = (a2b > 1e-6) & mask_b
    gt, pred = depth_b, a2b
    safe = jnp.where(m, gt, 1.0)
    abs_rel = jnp.where(m, jnp.abs(gt - pred) / safe, 0.0).sum() / jnp.maximum(m.sum(), 1)
    ratio = jnp.where(m, jnp.maximum(gt / jnp.where(m, pred, 1.0), pred / safe), jnp.inf)
    d1 = jnp.where(m, (ratio < 1.25).astype(jnp.float32), 0.0).sum() / jnp.maximum(m.sum(), 1)
    return abs_rel, d1


@jax.jit
def _pairwise_batch(depths, masks, i2ls, l2is):
    """depths [N,H,W]; returns (tae [N-1], tas [N-1])."""

    def one_pair(args):
        da, ma, ia, la, db, mb, ib, lb = args
        e_ab, s_ab = _directional(da, ma, ia, db, mb, lb)
        e_ba, s_ba = _directional(db, mb, ib, da, ma, la)
        return 0.5 * (e_ab + e_ba), 0.5 * (s_ab + s_ba)

    args = (
        depths[:-1], masks[:-1], i2ls[:-1], l2is[:-1],
        depths[1:], masks[1:], i2ls[1:], l2is[1:],
    )
    return jax.vmap(lambda *a: one_pair(a))(*args)


def temporal_metrics_sequence(pred_depths, masks, img2lidars):
    """TAE (x100 NOT applied) and TAS means over consecutive frame pairs.

    pred_depths [N,H,W] (already aligned+clipped), masks [N,H,W] bool,
    img2lidars [N,4,4].  Returns (tae_mean, tas_mean) floats.
    """
    depths = jnp.asarray(pred_depths, jnp.float32)
    masks_d = jnp.asarray(masks)
    i2l = jnp.asarray(np.asarray(img2lidars), jnp.float32)
    l2i = jnp.asarray(np.linalg.inv(np.asarray(img2lidars)), jnp.float32)
    tae_v, tas_v = _pairwise_batch(depths, masks_d, i2l, l2i)
    return float(jnp.mean(tae_v)), float(jnp.mean(tas_v))
