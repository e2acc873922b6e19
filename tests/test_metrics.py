"""Metric golden tests — invariances and closed-form checks."""

import numpy as np

from endodav_tpu.eval import metrics

RNG = np.random.default_rng(3)


def test_compute_errors_perfect():
    gt = RNG.uniform(1, 10, (32, 32))
    ar, sr, rmse, rl, a1, a2, a3 = metrics.compute_errors(gt, gt.copy())
    assert ar == 0 and sr == 0 and rmse == 0 and rl == 0
    assert a1 == a2 == a3 == 1.0


def test_compute_errors_known_ratio():
    gt = np.full((16, 16), 2.0)
    pred = np.full((16, 16), 3.0)
    ar, _, _, _, a1, a2, _ = metrics.compute_errors(gt, pred)
    np.testing.assert_allclose(ar, 0.5)
    assert a1 == 0.0 and a2 == 1.0  # 1.5 ratio: > 1.25, < 1.5625


def test_scale_and_shift_recovers_affine():
    x = RNG.uniform(0, 5, (1000,))
    y = 2.5 * x - 0.7
    s, t = metrics.compute_scale_and_shift(x, y)
    np.testing.assert_allclose([s, t], [2.5, -0.7], atol=1e-4)


def test_median_scaling():
    gt = RNG.uniform(1, 10, (8, 8))
    pred = gt / 4.0
    aligned, ratio = metrics.median_scaling(gt, pred.copy())
    np.testing.assert_allclose(ratio, 4.0, rtol=1e-6)
    np.testing.assert_allclose(aligned, gt, rtol=1e-5)


def test_align_shift_and_scale_recovers_affine():
    gt = RNG.uniform(5, 50, (32, 32))
    pred = gt * 0.1 + 3.0
    aligned, *_ = metrics.align_shift_and_scale(gt, pred)
    np.testing.assert_allclose(aligned, gt, rtol=1e-4)


def test_tae_tas_identity():
    depth = RNG.uniform(20, 80, (24, 30)).astype(np.float64)
    mask = np.ones_like(depth, dtype=bool)
    K = np.array([[260.0, 0, 15, 0], [0, 260.0, 12, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    img2lidar = np.linalg.inv(K)  # identity pose
    # same frame, same pose: reprojection is near-lossless up to the 0.5px
    # center rounding -> tae small, tas ~1
    e = metrics.tae(depth, mask, img2lidar, depth, mask, img2lidar)
    s = metrics.tas(depth, mask, img2lidar, depth, mask, img2lidar)
    assert e < 0.35  # rounding to nearest pixel on random fields
    assert s > 0.65


def test_pose_ate_zero_for_identical():
    aa = RNG.standard_normal((6, 3)) * 0.05
    ts = RNG.standard_normal((6, 3)) * 0.02
    from endodav_tpu.geometry import transformation_from_parameters
    import jax.numpy as jnp

    mats = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(ts)))
    xyz = np.array(metrics.dump_xyz(mats))
    assert metrics.compute_ate(xyz, xyz.copy()) < 1e-6
    rs = np.array(metrics.dump_r(mats))
    assert metrics.compute_re(rs, rs.copy()) < 1e-5


def test_compute_re_known_angle():
    theta = 0.1
    rz = np.array([[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    re = metrics.compute_re(np.array([rz]), np.array([np.eye(3)]))
    np.testing.assert_allclose(re, theta, atol=1e-6)


def test_interpolate_frames_endpoints():
    pre = [np.full((4, 4), 1.0) for _ in range(8)]
    post = [np.full((4, 4), 3.0) for _ in range(8)]
    out = metrics.interpolate_frames(pre, post)
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[-1], 3.0)
    np.testing.assert_allclose(out[4], 1.0 + 2.0 * (4 / 7))
