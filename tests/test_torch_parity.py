"""Block-level numerical parity vs torch-built reference computations.

The released reference weights aren't available in this environment, so
end-to-end weight parity can't be checked directly; instead these tests
build the reference computation graph *in torch primitives* inside the
test, push the same weights through our converter, and compare outputs.
This pins the subtle bits: fused-qkv head reshaping, exact-GELU,
LayerNorm eps, LayerScale placement, ResidualConvUnit ordering, and the
bilinear-resize fusion step.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from endodav_tpu.models.dpt import FeatureFusionBlock
from endodav_tpu.models.vit import ViTBlock
from endodav_tpu.utils.checkpoint import _conv_w, _lin_w

RNG = np.random.default_rng(99)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_vit_block_matches_torch():
    dim, heads, n, b = 64, 4, 21, 2
    block = ViTBlock(dim, heads, patch_hw=(3, 7), use_residual_block=False)
    x = RNG.standard_normal((b, n, dim)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    xt = _t(x)
    # norm1 -> attn -> ls1 residual
    h = F.layer_norm(xt, (dim,), _t(p["norm1"]["scale"]), _t(p["norm1"]["bias"]), eps=1e-6)
    qkv = F.linear(h, _t(np.asarray(p["attn"]["qkv"]["kernel"]).T), _t(p["attn"]["qkv"]["bias"]))
    qkv = qkv.reshape(b, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (dim // heads) ** -0.5, qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
    h = (attn @ v).transpose(1, 2).reshape(b, n, dim)
    h = F.linear(h, _t(np.asarray(p["attn"]["proj"]["kernel"]).T), _t(p["attn"]["proj"]["bias"]))
    xt = xt + h * _t(p["ls1"]["gamma"])
    # norm2 -> mlp -> ls2 residual
    h = F.layer_norm(xt, (dim,), _t(p["norm2"]["scale"]), _t(p["norm2"]["bias"]), eps=1e-6)
    h = F.linear(h, _t(np.asarray(p["mlp"]["fc1"]["kernel"]).T), _t(p["mlp"]["fc1"]["bias"]))
    h = F.gelu(h)
    h = F.linear(h, _t(np.asarray(p["mlp"]["fc2"]["kernel"]).T), _t(p["mlp"]["fc2"]["bias"]))
    want = xt + h * _t(p["ls2"]["gamma"])

    got = block.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_feature_fusion_block_matches_torch():
    feats, h, w, b = 16, 6, 8, 2
    fuse = FeatureFusionBlock(feats)
    x = RNG.standard_normal((b, h, w, feats)).astype(np.float32)
    skip = RNG.standard_normal((b, h, w, feats)).astype(np.float32)
    variables = fuse.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(skip), (h * 2, w * 2))
    p = variables["params"]

    def conv3(t, params):
        return F.conv2d(
            t, _t(np.transpose(np.asarray(params["kernel"]), (3, 2, 0, 1))), _t(params["bias"]), padding=1
        )

    def res_unit(t, params):
        y = F.relu(t)
        y = conv3(y, params["conv1"])
        y = F.relu(y)
        y = conv3(y, params["conv2"])
        return y + t

    xt = _t(np.moveaxis(x, -1, 1).copy())
    st = _t(np.moveaxis(skip, -1, 1).copy())
    out = xt + res_unit(st, p["resConfUnit1"])
    out = res_unit(out, p["resConfUnit2"])
    out = F.interpolate(out, (h * 2, w * 2), mode="bilinear", align_corners=True)
    out = F.conv2d(out, _t(np.transpose(np.asarray(p["out_conv"]["kernel"]), (3, 2, 0, 1))), _t(p["out_conv"]["bias"]))

    got = fuse.apply(variables, jnp.asarray(x), jnp.asarray(skip), (h * 2, w * 2))
    np.testing.assert_allclose(np.asarray(got), np.moveaxis(out.numpy(), 1, -1), atol=2e-4)


def test_pose_decoder_matches_torch():
    from endodav_tpu.models.decoders import PoseDecoder

    dec = PoseDecoder()
    feat = RNG.standard_normal((2, 4, 5, 512)).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(2), [jnp.asarray(feat)])
    p = variables["params"]

    ft = _t(np.moveaxis(feat, -1, 1).copy())
    conv = lambda t, prm, pad: F.conv2d(
        t, _t(np.transpose(np.asarray(prm["kernel"]), (3, 2, 0, 1))), _t(prm["bias"]), padding=pad
    )
    out = F.relu(conv(ft, p["squeeze"], 0))
    out = conv(out, p["pose_0"], 1)
    out = F.relu(out)
    out = conv(out, p["pose_1"], 1)
    mid = out
    out = F.relu(out)
    out = conv(out, p["pose_2"], 0)
    out = out.mean(3).mean(2)
    out = 0.001 * out.reshape(-1, 2, 1, 6)

    aa, tr, got_mid = dec.apply(variables, [jnp.asarray(feat)])
    np.testing.assert_allclose(np.asarray(aa), out[..., :3].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr), out[..., 3:].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mid), np.moveaxis(mid.numpy(), 1, -1), atol=2e-5)


def test_temporal_attention_matches_torch():
    from endodav_tpu.models.motion import TemporalAttention, sinusoidal_time_encoding

    dim, heads, t, bstar = 32, 4, 8, 6
    attn = TemporalAttention(dim, heads, temporal_max_len=t, pos_embedding_type="ape")
    x = RNG.standard_normal((bstar, t, dim)).astype(np.float32)
    variables = attn.init(jax.random.PRNGKey(3), jnp.asarray(x))
    p = variables["params"]

    xt = _t(x) + _t(sinusoidal_time_encoding(t, dim))[None]
    q = F.linear(xt, _t(np.asarray(p["to_q"]["kernel"]).T))
    k = F.linear(xt, _t(np.asarray(p["to_k"]["kernel"]).T))
    v = F.linear(xt, _t(np.asarray(p["to_v"]["kernel"]).T))
    dh = dim // heads
    reshape = lambda z: z.reshape(bstar, t, heads, dh).permute(0, 2, 1, 3)
    q, k, v = reshape(q) * dh ** -0.5, reshape(k), reshape(v)
    o = ((q @ k.transpose(-2, -1)).softmax(-1) @ v).permute(0, 2, 1, 3).reshape(bstar, t, dim)
    want = F.linear(o, _t(np.asarray(p["to_out"]["kernel"]).T), _t(p["to_out"]["bias"]))

    got = attn.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)
