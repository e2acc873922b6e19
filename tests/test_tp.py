"""Tensor-parallel trunk (parallel/tp.py) on the virtual CPU mesh.

The correctness contract: a g-way TP forward over the 'model' mesh axis
produces the single-device output (up to f32 reduction reordering), the
trunk params are genuinely sharded (local shard shapes are 1/g of the
global), and the compiled module actually communicates (psums present).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from endodav_tpu.models import EndoDAV
from endodav_tpu.parallel.tp import (
    build_tp_mesh, tp_param_specs, tp_prepare_params, tp_window_forward)

RNG = np.random.default_rng(3)

KW = dict(encoder="vits", image_shape=(56, 70), num_frames=4,
          lora_type="none", residual_block_indexes=(1,))


@pytest.fixture(scope="module")
def single_device_ref():
    m = EndoDAV(**KW)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 4, 56, 70, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(variables, x)[("disp", 0)], np.float32)
    return variables, x, ref


@pytest.mark.parametrize("g", [2, 3])
def test_tp_matches_single_device(single_device_ref, g):
    variables, x, ref = single_device_ref
    if len(jax.devices()) < g:
        pytest.skip("needs a multi-device mesh")
    mesh = build_tp_mesh(g)
    local = EndoDAV(tp_groups=g, **KW)
    fwd = tp_window_forward(local, variables, mesh, num_heads=6)
    out = np.asarray(fwd(x), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_tp_params_actually_sharded(single_device_ref):
    variables, x, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    g = 2
    mesh = build_tp_mesh(g)
    params = tp_prepare_params(variables["params"], g, num_heads=6)
    specs = tp_param_specs(params)
    blk = params["pretrained"]["blocks_0"]
    sp = specs["pretrained"]["blocks_0"]
    assert sp["attn"]["qkv"]["kernel"] == P(None, "model")
    assert sp["attn"]["proj"]["kernel"] == P("model", None)
    assert sp["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert sp["mlp"]["fc2"]["kernel"] == P("model", None)
    assert sp["mlp"]["fc2"]["bias"] == P()
    # decoder + embeddings replicated
    assert all(s == P() for s in jax.tree.leaves(
        specs["head"], is_leaf=lambda v: isinstance(v, P)))

    from jax.sharding import NamedSharding
    placed = jax.device_put(
        blk["attn"]["qkv"]["kernel"], NamedSharding(mesh, P(None, "model")))
    shard = placed.addressable_shards[0].data
    assert shard.shape == (384, 3 * 384 // g)


def test_tp_qkv_permutation_is_head_group_exact():
    """Device gi's contiguous qkv column slice must be its own packed
    [q|k|v] panel in (3, H/g, Dh) order."""
    c, h, g = 12, 6, 2
    dh = c // h
    w = RNG.standard_normal((c, 3 * c)).astype(np.float32)
    params = {"pretrained": {"blocks_0": {"attn": {"qkv": {"kernel": jnp.asarray(w)}}}}}
    out = np.asarray(
        tp_prepare_params(params, g, num_heads=h)
        ["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"])
    as_qkv = w.reshape(c, 3, h, dh)
    for gi in range(g):
        local = out[:, gi * 3 * c // g:(gi + 1) * 3 * c // g].reshape(
            c, 3, h // g, dh)
        np.testing.assert_array_equal(
            local, as_qkv[:, :, gi * h // g:(gi + 1) * h // g, :])


def test_tp_compiled_module_contains_reductions(single_device_ref):
    variables, x, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = build_tp_mesh(2)
    local = EndoDAV(tp_groups=2, **KW)
    fwd = tp_window_forward(local, variables, mesh, num_heads=6)
    hlo = fwd.lower(x).compile().as_text()
    assert "all-reduce" in hlo, "TP forward compiled without any all-reduce"


@pytest.mark.slow
def test_tp_through_engine_and_chunk_pipeline(single_device_ref):
    """--serve_mesh model=2 via engine.depth_window_forward must match the
    single-device forward through the FULL infer_video_depth pipeline
    (windows, keyframe carry, stitch)."""
    from endodav_tpu.eval import engine
    from endodav_tpu.eval.video_inference import infer_video_depth

    variables, _, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAV(**{**KW, "num_frames": 32})
    v32 = m.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 32, 56, 70, 3)))
    frames = np.asarray(
        RNG.integers(0, 255, (40, 64, 80, 3), dtype=np.uint8))

    single = infer_video_depth(
        engine.depth_window_forward(m, v32, "endodav"),
        frames, image_shape=(56, 70), chunk_windows=2)

    class Opt:
        serve_mesh = "model=2"

    fwd = engine.depth_window_forward(m, v32, "endodav", Opt())
    assert getattr(fwd, "precompiled", False)
    tp = infer_video_depth(fwd, frames, image_shape=(56, 70), chunk_windows=2)
    np.testing.assert_allclose(tp, single, rtol=2e-4, atol=2e-4)


def test_tp_split_compile_matches(single_device_ref, monkeypatch):
    """ENDODAV_SPLIT_COMPILE=1 under TP composes shard_map'd trunk/head
    jits; output must match the whole-model TP jit (and the single-device
    reference)."""
    variables, x, ref = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = build_tp_mesh(2)
    local = EndoDAV(tp_groups=2, **KW)
    monkeypatch.setenv("ENDODAV_SPLIT_COMPILE", "1")
    fwd = tp_window_forward(local, variables, mesh, num_heads=6)
    out = np.asarray(fwd(x), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_mesh_spec_model_rejected_for_training():
    """--mesh_shape model=N must stay a loud error (a silent all-devices
    data mesh would misreport the parallelism in use); the serving call
    sites opt in via allow_model."""
    from endodav_tpu.parallel import build_mesh, parse_mesh_shape

    with pytest.raises(ValueError, match="data=N"):
        parse_mesh_shape("model=4")
    assert parse_mesh_shape("model=4", allow_model=True) is None
    assert build_mesh("model=4", default_all=False, allow_model=True) is None


def test_build_tp_mesh_rejects_zero():
    with pytest.raises(ValueError, match="N >= 1"):
        build_tp_mesh(0)


def test_tp_passes_through_extra_collections():
    """Non-param collections (e.g. batch_stats) must travel replicated
    through tp_window_forward, not be dropped."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    import flax.linen as nn

    class WithStats(nn.Module):
        lora_type: str = "none"

        @nn.compact
        def __call__(self, win):
            x = nn.BatchNorm(use_running_average=True, name="bn")(win)
            return {("disp", 0): x.mean(axis=-1, keepdims=True)}

    m = WithStats()
    win = jnp.asarray(RNG.uniform(0, 1, (1, 2, 8, 8, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), win)
    assert "batch_stats" in v
    mesh = build_tp_mesh(2)
    fwd = tp_window_forward(m, v, mesh, num_heads=2)
    out = np.asarray(fwd(win))
    ref = np.asarray(m.apply(v, win)[("disp", 0)])
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.slow
def test_tp_composes_with_streaming(single_device_ref):
    """DepthStreamer over the TP forward (the latency story the model
    axis exists for) must emit the same frames as over the single-device
    forward — _chunk_fn already honors the precompiled marker."""
    from endodav_tpu.eval import engine
    from endodav_tpu.eval.streaming import DepthStreamer

    variables, _, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAV(**{**KW, "num_frames": 32})
    v32 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 56, 70, 3)))
    frames = np.asarray(RNG.integers(0, 255, (38, 64, 80, 3), dtype=np.uint8))

    class Opt:
        serve_mesh = "model=2"

    outs = {}
    for name, fwd in (
        ("single", engine.depth_window_forward(m, v32, "endodav")),
        ("tp", engine.depth_window_forward(m, v32, "endodav", Opt())),
    ):
        s = DepthStreamer(fwd, image_shape=(56, 70))
        got = []
        for f in frames:
            got.extend(s.push(f))
        got.extend(s.flush())
        outs[name] = np.stack(got)
    np.testing.assert_allclose(outs["tp"], outs["single"], rtol=2e-4, atol=2e-4)


def test_tp_engine_rejects_unmerged(single_device_ref):
    from endodav_tpu.eval import engine

    variables, _, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAV(**{**KW, "lora_type": "dvlora"})

    class Opt:
        serve_mesh = "model=2"

    with pytest.raises(ValueError, match="merge_lora"):
        engine.depth_window_forward(m, variables, "endodav", Opt())


def test_tp_endodac_single_frame(single_device_ref):
    """--serve_mesh model=N also covers the single-frame EndoDAC (same
    'pretrained' trunk subtree), through the engine + batched pipeline."""
    from endodav_tpu.eval import engine
    from endodav_tpu.eval.video_inference import infer_video_depth_single_frame
    from endodav_tpu.models import EndoDAC

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAC(backbone_size="vits", image_shape=(56, 70), lora_type="none",
                residual_block_indexes=(1,))
    x = jnp.zeros((2, 56, 70, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    frames = np.asarray(RNG.integers(0, 255, (5, 64, 80, 3), dtype=np.uint8))

    single = infer_video_depth_single_frame(
        engine.depth_window_forward(m, v, "endodac"), frames, batch_size=2)

    class Opt:
        serve_mesh = "model=2"

    fwd = engine.depth_window_forward(m, v, "endodac", Opt())
    tp = infer_video_depth_single_frame(fwd, frames, batch_size=2)
    np.testing.assert_allclose(tp, single, rtol=2e-4, atol=2e-4)


def test_tp_rejects_unmerged_adapters(single_device_ref):
    variables, x, _ = single_device_ref
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = build_tp_mesh(2)
    bad = EndoDAV(**{**KW, "lora_type": "dvlora"}, tp_groups=2)
    with pytest.raises(ValueError, match="merge"):
        tp_window_forward(bad, variables, mesh, num_heads=6)


@pytest.mark.slow
@pytest.mark.parametrize("g,data", [(2, 1), (3, 1), (2, 2)])
def test_tp_dedup_matches_single_device(g, data):
    """TP x dedup composition (round-4): `tp_dedup_window_forward` through
    the FULL infer_video_depth dedup pipeline must match the single-device
    dedup pipeline on a model=g (and data x model 2D) virtual mesh.
    g must divide the head count — 2/3/6 at vits (6 heads); model=4 is a
    vitl-heads configuration (16 heads) and is covered by the rejection
    test below."""
    from endodav_tpu.eval.video_inference import (dedup_window_forward,
                                                  infer_video_depth)
    from endodav_tpu.parallel.tp import tp_dedup_window_forward

    if len(jax.devices()) < g * data:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAV(**{**KW, "num_frames": 32})
    v32 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 56, 70, 3)))
    frames = np.asarray(RNG.integers(0, 255, (40, 64, 80, 3), dtype=np.uint8))

    def fwd_fn(v, win):
        return m.apply(v, win)[("disp", 0)]

    single = infer_video_depth(fwd_fn, frames, image_shape=(56, 70),
                               chunk_windows=2, variables=v32,
                               dedup=dedup_window_forward(m, v32))

    mesh = build_tp_mesh(g, data=data)
    local = EndoDAV(tp_groups=g, **{**KW, "num_frames": 32})
    tp_dedup = tp_dedup_window_forward(local, v32, mesh, num_heads=6)
    tp = infer_video_depth(fwd_fn, frames, image_shape=(56, 70),
                           chunk_windows=2, variables=v32, dedup=tp_dedup)
    np.testing.assert_allclose(tp, single, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_tp_dedup_streaming_matches():
    """DepthStreamer in dedup mode over the TP dedup pipeline (the
    flagship live-vitl composition: stream x dedup x TP) — per-frame
    [1]-batch encodes ride the replicated-batch fallback on a 2D mesh."""
    from endodav_tpu.eval.streaming import DepthStreamer
    from endodav_tpu.eval.video_inference import dedup_window_forward
    from endodav_tpu.parallel.tp import tp_dedup_window_forward

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    m = EndoDAV(**{**KW, "num_frames": 32})
    v32 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 56, 70, 3)))
    frames = np.asarray(RNG.integers(0, 255, (36, 64, 80, 3), dtype=np.uint8))

    def fwd_fn(win):
        return m.apply(v32, win)[("disp", 0)]

    outs = {}
    for name, dedup in (
        ("single", dedup_window_forward(m, v32)),
        ("tp", tp_dedup_window_forward(
            EndoDAV(tp_groups=2, **{**KW, "num_frames": 32}), v32,
            build_tp_mesh(2, data=2), num_heads=6)),
    ):
        s = DepthStreamer(fwd_fn, image_shape=(56, 70), dedup=dedup)
        got = []
        for f in frames:
            got.extend(s.push(f))
        got.extend(s.flush())
        outs[name] = np.stack(got)
    np.testing.assert_allclose(outs["tp"], outs["single"], rtol=2e-4, atol=2e-4)


def test_tp_dedup_rejects_indivisible_heads():
    """model=4 at vits (6 heads) must fail loudly — 4 is a vitl-heads
    (16) degree; silent padding would change the math."""
    from endodav_tpu.parallel.tp import tp_dedup_window_forward

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    # shape-only variables: the rejection fires on the param TREE before
    # any value matters, and a full num_frames=32 init compile cost 35 s
    # of the fast suite for a ValueError test
    m = EndoDAV(**{**KW, "num_frames": 2})
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 56, 70, 3)))
    v = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    with pytest.raises(ValueError, match="not divisible"):
        tp_dedup_window_forward(EndoDAV(tp_groups=4, **{**KW, "num_frames": 2}),
                                v, build_tp_mesh(4), num_heads=6)
