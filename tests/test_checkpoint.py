"""Checkpoint converter tests.

Validates (a) the conv/convtranspose/linear weight-layout transforms
against torch layers directly, and (b) that the rule table covers every
parameter of our models bijectively (round-trip through a synthetic
torch state dict).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.traverse_util import flatten_dict

from endodav_tpu.models import EndoDAV
from endodav_tpu.models.resnet import ResNetEncoder
from endodav_tpu.models.decoders import PoseDecoder
from endodav_tpu.utils import checkpoint as ckpt

RNG = np.random.default_rng(11)


def test_conv_weight_transform():
    w = RNG.standard_normal((5, 3, 3, 3)).astype(np.float32)
    b = RNG.standard_normal((5,)).astype(np.float32)
    x = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    tconv.weight.data = torch.from_numpy(w)
    tconv.bias.data = torch.from_numpy(b)
    ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()

    m = nn.Conv(5, (3, 3))
    p = {"params": {"kernel": jnp.asarray(ckpt._conv_w(w)), "bias": jnp.asarray(b)}}
    ours = np.moveaxis(np.asarray(m.apply(p, jnp.asarray(x))), -1, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_convtranspose_weight_transform():
    w = RNG.standard_normal((3, 5, 4, 4)).astype(np.float32)  # torch (I, O, kh, kw)
    b = RNG.standard_normal((5,)).astype(np.float32)
    x = RNG.standard_normal((1, 6, 7, 3)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=4)
    tconv.weight.data = torch.from_numpy(w)
    tconv.bias.data = torch.from_numpy(b)
    ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()

    m = nn.ConvTranspose(5, (4, 4), strides=(4, 4), transpose_kernel=True)
    p = {"params": {"kernel": jnp.asarray(ckpt._convT_w(w)), "bias": jnp.asarray(b)}}
    ours = np.moveaxis(np.asarray(m.apply(p, jnp.asarray(x))), -1, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def _synthetic_torch_sd(variables, component):
    """Inverse-map flax variables to a torch-style state dict with fresh
    random values (tests the forward mapping covers everything)."""
    has_cols = "params" in variables
    flat = {}
    if has_cols:
        for col, tree in variables.items():
            for k, v in flatten_dict(tree).items():
                flat[(col,) + k] = v
    else:
        flat = dict(flatten_dict(variables))

    inv = {ckpt._conv_w: lambda v: np.transpose(v, (3, 2, 0, 1)),
           ckpt._convT_w: lambda v: np.transpose(v, (3, 2, 0, 1)),
           ckpt._lin_w: lambda v: np.transpose(v, (1, 0))}
    sd = {}
    covered = set()
    for torch_key, flax_key, transform in ckpt.build_rules(component):
        if transform == "COLLECTION":
            key = flax_key if has_cols else flax_key[1:]
        else:
            key = (("params",) + flax_key) if has_cols else flax_key
        if key not in flat or key in covered:
            continue
        covered.add(key)
        target_shape = flat[key].shape
        value = RNG.standard_normal(target_shape).astype(np.float32)
        if transform not in (None, "COLLECTION"):
            value_t = inv[transform](value)
        else:
            value_t = value
        sd[torch_key] = value_t
    uncovered = set(flat.keys()) - covered
    return sd, uncovered


@pytest.mark.slow
def test_endodav_rules_cover_all_params():
    m = EndoDAV(encoder="vits", image_shape=(28, 42), num_frames=2,
                lora_type="dvlora", residual_block_indexes=(2, 5, 8, 11), temporal_lora=True)
    x = jnp.zeros((1, 2, 28, 42, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    sd, uncovered = _synthetic_torch_sd(variables, "endodav")
    assert not uncovered, f"params not covered by converter rules: {sorted(uncovered)[:10]}"

    new_vars, report = ckpt.torch_to_flax(sd, "endodav", variables)
    assert not report["mismatched"], report["mismatched"][:5]
    assert not report["ignored"], report["ignored"][:5]
    # every leaf replaced
    for k, v in flatten_dict(new_vars["params"]).items():
        assert np.asarray(v).std() > 0 or np.prod(v.shape) <= 1, k


def test_resnet_rules_cover_all_params():
    m = ResNetEncoder(num_layers=18, num_input_images=2)
    x = jnp.zeros((1, 32, 32, 6))
    variables = m.init(jax.random.PRNGKey(0), x)
    sd, uncovered = _synthetic_torch_sd(variables, "resnet_encoder")
    assert not uncovered, sorted(uncovered)[:10]
    new_vars, report = ckpt.torch_to_flax(sd, "resnet_encoder", variables)
    assert not report["mismatched"] and not report["ignored"]
    assert "batch_stats" in new_vars


def test_pose_decoder_rules():
    m = PoseDecoder()
    feats = [jnp.zeros((1, 4, 5, 512))]
    variables = m.init(jax.random.PRNGKey(0), feats)
    sd, uncovered = _synthetic_torch_sd(variables, "decoder")
    assert not uncovered, sorted(uncovered)[:10]
    _, report = ckpt.torch_to_flax(sd, "decoder", variables)
    assert not report["mismatched"] and not report["ignored"]


def test_save_load_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "t.msgpack")
    ckpt.save_pytree(path, tree, metadata={"height": 256, "width": 320})
    loaded = ckpt.load_pytree(path, tree)
    np.testing.assert_allclose(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    assert ckpt.load_metadata(path)["height"] == 256


def test_dataparallel_module_prefix_stripped():
    """DataParallel checkpoints prefix every key with 'module.'
    (trainer saves wrapped models when --use_dp); converter must strip it."""
    m = PoseDecoder()
    feats = [jnp.zeros((1, 4, 5, 512))]
    variables = m.init(jax.random.PRNGKey(0), feats)
    sd, _ = _synthetic_torch_sd(variables, "decoder")
    sd_dp = {"module." + k: v for k, v in sd.items()}
    _, report = ckpt.torch_to_flax(sd_dp, "decoder", variables)
    assert not report["ignored"] and not report["mismatched"]
    assert len(report["used"]) == len(sd)
