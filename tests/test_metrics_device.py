"""On-device TAE/TAS vs the numpy reference implementation."""

import numpy as np

from endodav_tpu.eval import metrics as M
from endodav_tpu.eval.metrics_device import temporal_metrics_sequence

RNG = np.random.default_rng(17)


def _make_sequence(n=5, h=20, w=26):
    depths = RNG.uniform(30, 90, (n, h, w)).astype(np.float32)
    masks = RNG.random((n, h, w)) > 0.1
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.8 * w, 1.0 * h, w / 2, h / 2
    i2ls = []
    for i in range(n):
        pose = np.eye(4)
        pose[:3, 3] = [0.3 * i, 0.1 * i, 0.05 * i]
        i2ls.append(np.linalg.inv(K @ pose))
    return depths, masks, np.stack(i2ls)


def test_device_tae_tas_matches_numpy():
    depths, masks, i2ls = _make_sequence()
    tae_ref, tas_ref = [], []
    for i in range(len(depths) - 1):
        tae_ref.append(M.tae(depths[i], masks[i], i2ls[i], depths[i + 1], masks[i + 1], i2ls[i + 1]))
        tas_ref.append(M.tas(depths[i], masks[i], i2ls[i], depths[i + 1], masks[i + 1], i2ls[i + 1]))
    tae_dev, tas_dev = temporal_metrics_sequence(depths, masks, i2ls)
    np.testing.assert_allclose(tae_dev, np.mean(tae_ref), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(tas_dev, np.mean(tas_ref), rtol=1e-3, atol=1e-5)


def test_device_tae_identity_pose_matches_numpy():
    depths, masks, _ = _make_sequence(n=3)
    K = np.eye(4)
    h, w = depths.shape[1:]
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = w, h, w / 2, h / 2
    i2ls = np.repeat(np.linalg.inv(K)[None], 3, axis=0)
    tae, tas = temporal_metrics_sequence(depths, masks, i2ls)
    ref_tae = np.mean([
        M.tae(depths[i], masks[i], i2ls[i], depths[i + 1], masks[i + 1], i2ls[i + 1])
        for i in range(2)
    ])
    # identity pose puts many points exactly on pixel-center .5 boundaries,
    # where round() ties can resolve differently in f32 vs f64 — allow 5%
    np.testing.assert_allclose(tae, ref_tae, rtol=0.05)
