"""One-hot-matmul warp kernels vs the XLA gather/scatter oracles.

The oracles (ops/sampling.py gather grid_sample and scatter splat) are
themselves torch-parity-tested in test_ops.py, so matching them in
interpret mode transfers that parity to the Pallas kernels — forward
AND gradients (the kernels' custom_vjp backward is hand-written
transposed matmuls, exactly what these tests must pin down).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from endodav_tpu.ops import sampling

RNG = np.random.default_rng(31)


def _coords(b, ho, wo, h, w, spread=1.4):
    """Normalized grid spanning out-of-range on purpose."""
    g = RNG.uniform(-spread, spread, (b, ho, wo, 2)).astype(np.float32)
    return jnp.asarray(g)


def _frac(grid, h, w, align_corners):
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        return (gx + 1.0) * 0.5 * (w - 1), (gy + 1.0) * 0.5 * (h - 1)
    return ((gx + 1.0) * w - 1.0) * 0.5, ((gy + 1.0) * h - 1.0) * 0.5


@pytest.mark.parametrize("c", [1, 2, 3])
@pytest.mark.parametrize("zeros,ac", [(False, True), (True, True), (False, False)])
def test_grid_sample_mm_matches_gather(c, zeros, ac):
    from endodav_tpu.kernels.warp_matmul import grid_sample_mm

    b, h, w = 2, 24, 40
    ho, wo = 16, 33  # non-multiple of the block to exercise padding
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    grid = _coords(b, ho, wo, h, w)
    mode = "zeros" if zeros else "border"
    want = sampling.grid_sample(img, grid, padding_mode=mode, align_corners=ac)
    fx, fy = _frac(grid, h, w, ac)
    with pltpu.force_tpu_interpret_mode():
        got = grid_sample_mm(img, fx, fy, zeros, ac)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("zeros", [False, True])
def test_grid_sample_mm_grads_match(c, zeros):
    from endodav_tpu.kernels.warp_matmul import grid_sample_mm

    b, h, w = 1, 16, 24
    ho, wo = 9, 13
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    grid = _coords(b, ho, wo, h, w)
    mode = "zeros" if zeros else "border"
    wgt = jnp.asarray(RNG.standard_normal((b, ho, wo, c)).astype(np.float32))

    def loss_ref(img, grid):
        return (sampling.grid_sample(img, grid, padding_mode=mode,
                                     align_corners=True) * wgt).sum()

    def loss_ker(img, grid):
        fx, fy = _frac(grid, h, w, True)
        return (grid_sample_mm(img, fx, fy, zeros, True) * wgt).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               atol=2e-4, rtol=1e-4)


def test_grid_sample_mm_integer_coords_exact():
    """Identity grid must reproduce the image exactly (weights 1/0)."""
    from endodav_tpu.kernels.warp_matmul import grid_sample_mm

    b, h, w, c = 1, 12, 16, 3
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fx = jnp.broadcast_to(xx[None], (b, h, w))
    fy = jnp.broadcast_to(yy[None], (b, h, w))
    with pltpu.force_tpu_interpret_mode():
        got = grid_sample_mm(img, fx, fy, False, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(img))


def test_splat_mm_matches_scatter():
    from endodav_tpu.kernels.warp_matmul import splat_mm

    b, h, w = 2, 20, 28
    coords = jnp.asarray(
        np.stack([RNG.uniform(-3, w + 2, (b, h, w)),
                  RNG.uniform(-3, h + 2, (b, h, w))], axis=-1).astype(np.float32))
    want = sampling._splat_xla(coords, h, w)
    x = coords[..., 0].reshape(b, -1)
    y = coords[..., 1].reshape(b, -1)
    with pltpu.force_tpu_interpret_mode():
        got = splat_mm(x, y, h, w)
    np.testing.assert_allclose(np.asarray(got).reshape(b, h, w, 1),
                               np.asarray(want), atol=1e-4, rtol=1e-5)


def test_splat_fast_backward_matches_xla():
    b, h, w = 1, 12, 16
    coords = jnp.asarray(
        np.stack([RNG.uniform(0, w - 1, (b, h, w)),
                  RNG.uniform(0, h - 1, (b, h, w))], axis=-1).astype(np.float32))
    wgt = jnp.asarray(RNG.standard_normal((b, h, w, 1)).astype(np.float32))

    def loss_ref(c):
        return (sampling._splat_xla(c, h, w) * wgt).sum()

    def loss_ker(c):
        return (sampling._splat_fast(c, h, w) * wgt).sum()

    gr = jax.grad(loss_ref)(coords)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker)(coords)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("local", [True, False])
def test_grid_sample_mm_banded_path(local):
    """h > _BAND routes per-chunk through the banded branch (local flows)
    or the full-height fallback (scattered coords) — both must match the
    gather oracle, forward and grads."""
    from endodav_tpu.kernels import warp_matmul as wm

    b, h, w, c = 1, 96, 40, 3
    assert h > wm._BAND
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    if local:
        # identity + small flow: every chunk's source rows stay local
        fx = xx[None] + RNG.uniform(-2, 2, (b, h, w)).astype(np.float32)
        fy = yy[None] + RNG.uniform(-2, 2, (b, h, w)).astype(np.float32)
    else:
        fx = RNG.uniform(-3, w + 2, (b, h, w)).astype(np.float32)
        fy = RNG.uniform(-3, h + 2, (b, h, w)).astype(np.float32)
    fx, fy = jnp.asarray(fx), jnp.asarray(fy)

    # the plan must actually produce band hits for local flows (else this
    # test would silently only exercise the fallback)
    packed, _, _ = wm._pack_coords(fx, fy, h, w, False, wm._pick_pb(c))
    _, _, ok = wm._band_plan(packed, h, wm._pick_pb(c))
    if local:
        assert float(jnp.mean(ok.astype(jnp.float32))) > 0.9
    else:
        assert float(jnp.mean(ok.astype(jnp.float32))) < 0.5

    def to_grid(fx, fy):  # fractional pixels -> normalized (ac=True)
        gx = fx / (w - 1) * 2.0 - 1.0
        gy = fy / (h - 1) * 2.0 - 1.0
        return jnp.stack([gx, gy], axis=-1)

    want = sampling.grid_sample(img, to_grid(fx, fy), padding_mode="border",
                                align_corners=True)
    wgt = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))

    def loss_ker(img, fx, fy):
        return (wm.grid_sample_mm(img, fx, fy, False, True) * wgt).sum()

    def loss_ref(img, fx, fy):
        return (sampling.grid_sample(img, to_grid(fx, fy),
                                     padding_mode="border",
                                     align_corners=True) * wgt).sum()

    with pltpu.force_tpu_interpret_mode():
        got = wm.grid_sample_mm(img, fx, fy, False, True)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(img, fx, fy)
    # 3e-5: _dot3's compensated product drops the al@bl term (~2^-18
    # relative, module docstring) — not a banding artifact.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(img, fx, fy)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_splat_mm_banded_matches_scatter():
    from endodav_tpu.kernels.warp_matmul import splat_mm

    b, h, w = 1, 96, 28
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # local flow for most pixels, a scattered block to force fallbacks
    fx = xx[None] + RNG.uniform(-2, 2, (b, h, w)).astype(np.float32)
    fy = yy[None] + RNG.uniform(-2, 2, (b, h, w)).astype(np.float32)
    fy[:, :8] = RNG.uniform(0, h - 1, (b, 8, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([fx, fy], axis=-1))
    want = sampling._splat_xla(coords, h, w)
    with pltpu.force_tpu_interpret_mode():
        got = splat_mm(coords[..., 0].reshape(b, -1),
                       coords[..., 1].reshape(b, -1), h, w)
    np.testing.assert_allclose(np.asarray(got).reshape(b, h, w, 1),
                               np.asarray(want), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("c,h", [(1, 72), (3, 72), (1, 65)])
def test_grid_sample_mm_band_edges(c, h):
    """Band-plan edge cases: h a non-multiple of the band, and every
    coordinate in the bottom rows so the 8-aligned band start clamps to
    h - _BAND (the `min(..., h-_BAND)` branch)."""
    from endodav_tpu.kernels import warp_matmul as wm

    b, w = 1, 24
    assert h > wm._BAND
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    # all source y in the last 6 rows (incl. past the border -> clipped),
    # x across and past the full width
    fy = jnp.asarray(RNG.uniform(h - 6, h + 2, (b, 16, 20)).astype(np.float32))
    fx = jnp.asarray(RNG.uniform(-2, w + 1, (b, 16, 20)).astype(np.float32))

    packed, _, _ = wm._pack_coords(fx, fy, h, w, False, wm._pick_pb(c))
    band, _, ok = wm._band_plan(packed, h, wm._pick_pb(c))
    assert int(jnp.max(band)) <= h - wm._BAND  # clamp held
    # the kernels assert this via pl.multiple_of: every start (including
    # the h % 8 != 0 clamp) must be 8-aligned or Mosaic loads garbage
    assert not np.any(np.asarray(band) % 8)
    if h % 8 == 0:
        assert float(jnp.mean(ok.astype(jnp.float32))) > 0.9  # banded route
    else:
        # bottom rows past the aligned clamp can't fit the band window;
        # those chunks must take the exact full-height fallback
        assert float(jnp.mean(ok.astype(jnp.float32))) < 0.5

    def to_grid(fx, fy):
        gx = fx / (w - 1) * 2.0 - 1.0
        gy = fy / (h - 1) * 2.0 - 1.0
        return jnp.stack([gx, gy], axis=-1)

    want = sampling.grid_sample(img, to_grid(fx, fy), padding_mode="border",
                                align_corners=True)
    with pltpu.force_tpu_interpret_mode():
        got = wm.grid_sample_mm(img, fx, fy, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_splat_mm_band_bottom_clamp():
    from endodav_tpu.kernels.warp_matmul import splat_mm, _BAND

    b, h, w = 1, 80, 24
    assert h > _BAND
    fy = RNG.uniform(h - 5, h - 1, (b, h * w)).astype(np.float32)
    fx = RNG.uniform(0, w - 1, (b, h * w)).astype(np.float32)
    coords = jnp.asarray(np.stack([fx.reshape(b, h, w),
                                   fy.reshape(b, h, w)], axis=-1))
    want = sampling._splat_xla(coords, h, w)
    with pltpu.force_tpu_interpret_mode():
        got = splat_mm(jnp.asarray(fx), jnp.asarray(fy), h, w)
    np.testing.assert_allclose(np.asarray(got).reshape(b, h, w, 1),
                               np.asarray(want), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("local", [True, False])
def test_grid_sample_mm_tiled_lane_windows(monkeypatch, c, local):
    """Tile mode (default): tile-ordered chunks + 128-px lane windows.
    Local flows take the windowed route (asserted via the plan); scattered
    coords fall back — both must match the gather oracle, fwd + grads."""
    from endodav_tpu.kernels import warp_matmul as wm

    monkeypatch.delenv("ENDODAV_WARP_NOTILE", raising=False)  # tile is the default
    b, h, w = 1, 96, 160  # divisible by every tile shape; w*c > lane window
    img = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    if local:
        fx = xx[None] + RNG.uniform(-3, 3, (b, h, w)).astype(np.float32)
        fy = yy[None] + RNG.uniform(-3, 3, (b, h, w)).astype(np.float32)
    else:
        fx = RNG.uniform(-3, w + 2, (b, h, w)).astype(np.float32)
        fy = RNG.uniform(-3, h + 2, (b, h, w)).astype(np.float32)
    fx, fy = jnp.asarray(fx), jnp.asarray(fy)

    # the plan must produce windowed hits for local flows
    pb = wm._pick_pb(c)
    tile = wm._tile_shape(pb, h, w)
    assert tile is not None
    packed, _, _ = wm._pack_coords(wm._tile_cols(fx, *tile),
                                   wm._tile_cols(fy, *tile), h, w, False, pb)
    lw = wm._lane_window(c)
    wcp = wm._round_up(w * c, wm._LANE)
    _, lane, ok = wm._band_plan(packed, h, pb, wcp, lw, c)
    rate = float(jnp.mean(ok.astype(jnp.float32)))
    assert (rate > 0.9) if local else (rate < 0.5)
    assert int(jnp.max(lane)) <= wcp - lw and int(jnp.max(lane)) % 128 == 0

    def to_grid(fx, fy):
        gx = fx / (w - 1) * 2.0 - 1.0
        gy = fy / (h - 1) * 2.0 - 1.0
        return jnp.stack([gx, gy], axis=-1)

    want = sampling.grid_sample(img, to_grid(fx, fy), padding_mode="border",
                                align_corners=True)
    wgt = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))

    def loss_ker(img, fx, fy):
        return (wm.grid_sample_mm(img, fx, fy, False, True) * wgt).sum()

    def loss_ref(img, fx, fy):
        return (sampling.grid_sample(img, to_grid(fx, fy),
                                     padding_mode="border",
                                     align_corners=True) * wgt).sum()

    with pltpu.force_tpu_interpret_mode():
        got = wm.grid_sample_mm(img, fx, fy, False, True)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(img, fx, fy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(img, fx, fy)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_splat_mm_tiled_matches_scatter(monkeypatch):
    from endodav_tpu.kernels.warp_matmul import splat_mm

    monkeypatch.delenv("ENDODAV_WARP_NOTILE", raising=False)  # tile is the default
    b, h, w = 1, 96, 160
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # local flow, with a scattered block and a right-edge block (the lane
    # clamp at wp - lw) to force both window clamps and fallbacks
    fx = xx[None] + RNG.uniform(-3, 3, (b, h, w)).astype(np.float32)
    fy = yy[None] + RNG.uniform(-3, 3, (b, h, w)).astype(np.float32)
    fy[:, :8] = RNG.uniform(0, h - 1, (b, 8, w)).astype(np.float32)
    fx[:, 8:16] = RNG.uniform(w - 20, w - 1, (b, 8, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([fx, fy], axis=-1))
    want = sampling._splat_xla(coords, h, w)
    with pltpu.force_tpu_interpret_mode():
        got = splat_mm(coords[..., 0].reshape(b, -1),
                       coords[..., 1].reshape(b, -1), h, w)
    np.testing.assert_allclose(np.asarray(got).reshape(b, h, w, 1),
                               np.asarray(want), atol=1e-4, rtol=1e-5)


def test_dispatch_env_override(monkeypatch):
    monkeypatch.setenv("ENDODAV_NO_WARP_MM", "1")
    assert not sampling._use_mm_kernel(256, 320, 3)
    monkeypatch.delenv("ENDODAV_NO_WARP_MM")
    expect = jax.default_backend() == "tpu"
    assert sampling._use_mm_kernel(256, 320, 3) == expect
    # over-VMEM image must fall back regardless of backend
    assert not sampling._use_mm_kernel(2048, 2048, 3)


def test_env_override_validation(monkeypatch):
    """ENDODAV_WARP_LW / ENDODAV_WARP_PB are A/B knobs read unvalidated
    before round 5: a non-128-multiple lane window broke the kernels'
    pl.multiple_of alignment promise SILENTLY (wrong outputs, not an
    error).  Bad values must raise at read time."""
    from endodav_tpu.kernels import warp_matmul as wm

    monkeypatch.setenv("ENDODAV_WARP_LW", "200")
    with pytest.raises(ValueError, match="ENDODAV_WARP_LW"):
        wm._lane_window(3)
    monkeypatch.setenv("ENDODAV_WARP_LW", "0")
    with pytest.raises(ValueError, match="ENDODAV_WARP_LW"):
        wm._lane_window(3)
    monkeypatch.setenv("ENDODAV_WARP_LW", "384")
    assert wm._lane_window(3) == 384

    monkeypatch.setenv("ENDODAV_WARP_PB", "192")
    with pytest.raises(ValueError, match="ENDODAV_WARP_PB"):
        wm._pick_pb(3)
    monkeypatch.setenv("ENDODAV_WARP_PB", "256")
    assert wm._pick_pb(3, backward=True) == 256


def test_channel_plane_layout_matches_interleaved(monkeypatch):
    """ENDODAV_WARP_CP=1 (the round-5 measured-negative experiment) must
    stay CORRECT even though it is off by default: forward and both
    gradient paths agree with the interleaved layout."""
    from endodav_tpu.kernels import warp_matmul as wm

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((2, 32, 40, 3)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, 41, (2, 32, 40)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 33, (2, 32, 40)).astype(np.float32))

    def loss(im, x, y):
        return (wm.grid_sample_mm(im, x, y, True, True, True) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.delenv("ENDODAV_WARP_CP", raising=False)
        ref = wm.grid_sample_mm(img, fx, fy, True, True, True)
        gref = jax.grad(loss, argnums=(0, 1, 2))(img, fx, fy)
        monkeypatch.setenv("ENDODAV_WARP_CP", "1")
        got = wm.grid_sample_mm(img, fx, fy, True, True, True)
        ggot = jax.grad(loss, argnums=(0, 1, 2))(img, fx, fy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    for a, b in zip(ggot, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)
