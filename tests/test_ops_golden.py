"""Golden-value tests: our TPU ops vs torch CPU reference semantics.

The reference pipeline's numerics hinge on torch's resize / grid_sample
conventions (SURVEY.md §7 'hard parts' #1-2); these tests pin ours to
torch within float32 tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from endodav_tpu.ops import (
    flow_consistency,
    flow_warp,
    grid_sample,
    occlusion_mask_backward,
    resize2d,
)

RNG = np.random.default_rng(314)


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("in_hw,out_hw", [((256, 320), (224, 280)), ((17, 23), (64, 80)), ((64, 80), (32, 40))])
def test_bilinear_align_corners_true(in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_hw, "bilinear", align_corners=True))
    ref = from_nchw(F.interpolate(to_nchw(x), out_hw, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 80), (128, 160)), ((63, 81), (32, 40))])
def test_bilinear_align_corners_false(in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_hw, "bilinear", align_corners=False))
    ref = from_nchw(F.interpolate(to_nchw(x), out_hw, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_bilinear_antialias_downscale():
    x = RNG.standard_normal((1, 96, 128, 3), dtype=np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (32, 40), "bilinear", align_corners=False, antialias=True))
    ref = from_nchw(F.interpolate(to_nchw(x), (32, 40), mode="bilinear", align_corners=False, antialias=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_bicubic_upscale_matches_torch():
    x = RNG.standard_normal((1, 37, 37, 8), dtype=np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (16, 20), "bicubic", align_corners=False))
    ref = from_nchw(F.interpolate(to_nchw(x), (16, 20), mode="bicubic", align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_bicubic_with_explicit_scale_factor():
    # Pos-embed interpolation path: scale_factor=(w0+0.1)/sqrt(N) (vision_transformer.py:200-209)
    x = RNG.standard_normal((1, 37, 37, 16), dtype=np.float32)
    sx, sy = (16 + 0.1) / 37.0, (20 + 0.1) / 37.0
    ref = from_nchw(F.interpolate(to_nchw(x), scale_factor=(sx, sy), mode="bicubic", align_corners=False))
    oh, ow = ref.shape[1:3]
    ours = np.asarray(
        resize2d(jnp.asarray(x), (oh, ow), "bicubic", align_corners=False, scale_hw=(sx, sy))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_nearest():
    x = RNG.standard_normal((1, 13, 17, 2), dtype=np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (26, 34), "nearest"))
    ref = from_nchw(F.interpolate(to_nchw(x), (26, 34), mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=0)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample(padding, align):
    img = RNG.standard_normal((2, 24, 30, 3), dtype=np.float32)
    grid = (RNG.uniform(-1.3, 1.3, size=(2, 24, 30, 2))).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), padding, align))
    ref = from_nchw(
        F.grid_sample(to_nchw(img), torch.from_numpy(grid), mode="bilinear", padding_mode=padding, align_corners=align)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flow_warp_identity():
    img = RNG.standard_normal((1, 16, 20, 3), dtype=np.float32)
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.zeros((1, 16, 20, 2))))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_occlusion_mask_zero_flow_is_all_ones():
    mask, occ = occlusion_mask_backward(jnp.zeros((1, 16, 20, 2)))
    np.testing.assert_allclose(np.asarray(mask), 1.0)
    np.testing.assert_allclose(np.asarray(occ), 1.0, atol=1e-6)


def test_occlusion_map_matches_torch_scatter():
    # Golden check against the reference formulation via torch scatter_add_.
    h, w = 12, 15
    flow = RNG.uniform(-2.5, 2.5, size=(2, h, w, 2)).astype(np.float32)
    _, occ = occlusion_mask_backward(jnp.asarray(flow))

    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    x = torch.from_numpy(xx[None] + flow[..., 1]).reshape(2, -1)
    y = torch.from_numpy(yy[None] + flow[..., 0]).reshape(2, -1)
    x1, y1 = torch.floor(x), torch.floor(y)
    x_floor, y_floor = x1.clamp(0, w - 1), y1.clamp(0, h - 1)
    x0, y0 = x1 + 1, y1 + 1
    x_ceil, y_ceil = x0.clamp(0, w - 1), y0.clamp(0, h - 1)
    invalid = torch.cat(
        [
            (x0 != x_ceil) | (y0 != y_ceil),
            (x0 != x_ceil) | (y1 != y_floor),
            (x1 != x_floor) | (y0 != y_ceil),
            (x1 != x_floor) | (y1 != y_floor),
        ],
        1,
    )
    ref = torch.zeros(2, h * w)
    idx = torch.cat([x_ceil + y_ceil * w, x_ceil + y_floor * w, x_floor + y_ceil * w, x_floor + y_floor * w], 1).long()
    vals = torch.cat(
        [
            (1 - (x - x_ceil).abs()) * (1 - (y - y_ceil).abs()),
            (1 - (x - x_ceil).abs()) * (1 - (y - y_floor).abs()),
            (1 - (x - x_floor).abs()) * (1 - (y - y_ceil).abs()),
            (1 - (x - x_floor).abs()) * (1 - (y - y_floor).abs()),
        ],
        1,
    )
    vals[invalid] = 0
    ref.scatter_add_(1, idx, vals)
    np.testing.assert_allclose(np.asarray(occ).reshape(2, -1), ref.numpy(), atol=1e-4)


def test_flow_consistency_zero_flows():
    out = np.asarray(flow_consistency(jnp.zeros((1, 8, 10, 2)), jnp.zeros((1, 8, 10, 2))))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_grid_sample_uint8_matches_float():
    """u8 gather + f32 blend == f32 gather + blend (linearity of the
    conversion), to f32 rounding."""
    import jax.numpy as jnp

    from endodav_tpu.ops.sampling import grid_sample

    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (2, 16, 20, 3), dtype=np.uint8)
    img_f = jnp.asarray(u8.astype(np.float32) / 255.0)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 16, 20, 2)).astype(np.float32))
    for mode in ("border", "zeros"):
        want = grid_sample(img_f, grid, padding_mode=mode)
        got = grid_sample(jnp.asarray(u8), grid, padding_mode=mode) / 255.0
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)
