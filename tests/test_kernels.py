"""Pallas kernel correctness vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endodav_tpu.ops.attention import _xla_attention

RNG = np.random.default_rng(21)


def _pallas_interpret_attention(q, k, v, scale):
    """Run the kernel in interpreter mode (CPU-safe)."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels import flash_attention as fa

    with pltpu.force_tpu_interpret_mode():
        return fa._forward(q, k, v, scale)


@pytest.mark.parametrize("n,h", [(321, 3), (128, 3), (600, 3), (1370, 3),
                                 (600, 16)])
def test_flash_attention_matches_xla(n, h):
    # n=600/1370 exercise the multi-q-block grid path (n_pad not a
    # multiple of block_q=512) — the production 518px regime; a floor-
    # division grid left trailing query rows unwritten (round-2 bug).
    # (600, 16) exercises the head-group axis (vitl widths: H*Dh=1024
    # blows the VMEM budget with whole K/V blocks -> lanes sliced).
    b, dh = 2, 64
    if n > 512:
        b = 1
    q = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))
    scale = dh ** -0.5
    ref = _xla_attention(q, k, v, scale)
    out = _pallas_interpret_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_backward_matches_xla():
    from endodav_tpu.kernels.flash_attention import _bwd

    b, n, h, dh = 1, 37, 2, 16
    q = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, n, h, dh)).astype(np.float32))

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, dh ** -0.5) ** 2).sum()

    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g = 2 * _xla_attention(q, k, v, dh ** -0.5)
    dq, dk, dv = _bwd(dh ** -0.5, None, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gref[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gref[2]), atol=1e-4)


@pytest.mark.parametrize("dh,h", [(8, 8), (24, 8), (64, 4)])
def test_temporal_attention_matches_xla(dh, h):
    from endodav_tpu.kernels import temporal_attention as ta

    bstar, t = 13, 32  # non-multiple of the row block to exercise padding
    q = jnp.asarray(RNG.standard_normal((bstar, t, h, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((bstar, t, h, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((bstar, t, h, dh)).astype(np.float32))
    scale = dh ** -0.5
    ref = _xla_attention(q, k, v, scale)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = ta._forward(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_attention_backward_matches_xla():
    from endodav_tpu.kernels.temporal_attention import _bwd

    b, t, h, dh = 3, 8, 2, 16
    q = jnp.asarray(RNG.standard_normal((b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, t, h, dh)).astype(np.float32))

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, dh ** -0.5) ** 2).sum()

    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g = 2 * _xla_attention(q, k, v, dh ** -0.5)
    dq, dk, dv = _bwd(dh ** -0.5, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gref[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gref[2]), atol=1e-4)


@pytest.mark.parametrize("n", [321, 600])
def test_qkv_flash_attention_matches_unfused(n):
    """The fused-qkv entry (x padded once, q/k/v projected from weight
    slices at padded length, bias pad rows score-masked) must match the
    unfused qkv Dense -> split -> attention math, forward and grads."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels import flash_attention as fa

    b, h, dh = 1, 3, 32
    c = h * dh
    x = jnp.asarray(RNG.standard_normal((b, n, c)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bias = jnp.asarray(RNG.standard_normal((3 * c,)).astype(np.float32))

    def unfused(x, w, bias):
        qkv = (x @ w + bias).reshape(b, n, 3, h, dh)
        return _xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                              dh ** -0.5)

    ref = unfused(x, w, bias)
    with pltpu.force_tpu_interpret_mode():
        out = fa.qkv_flash_attention(x, w, bias, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def loss_fused(x, w, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fa.qkv_flash_attention(x, w, bias, h) ** 2).sum()

    def loss_ref(x, w, bias):
        return (unfused(x, w, bias) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("c,heads,bstar", [(64, 8, 40), (192, 8, 24),
                                           (512, 8, 12)])
def test_fused_temporal_block_matches_xla(c, heads, bstar):
    # c=512 exercises the head-grouped wide-channel path (vitl widths)
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels.fused_temporal_block import (
        fused_temporal_block, reference_block)

    rng = np.random.default_rng(1)
    t = 32
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)
    x = f(bstar, t, c)
    gamma, beta, bo = f(c) + 1.0, f(c), f(c)
    pe = f(t, c)
    wq, wk, wv, wo = f(c, c), f(c, c), f(c, c), f(c, c)

    want = reference_block(x, gamma, beta, pe, wq, wk, wv, wo, bo, heads)
    with pltpu.force_tpu_interpret_mode():
        got = fused_temporal_block(x, gamma, beta, pe, wq, wk, wv, wo, bo,
                                   heads, 16)
    # the grouped path splits the out-projection contraction across head
    # groups — pure f32 summation-order noise vs the single-dot oracle
    atol = 1e-3 if c >= 512 else 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=atol, rtol=1e-5)


def test_fused_temporal_block_backward_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels.fused_temporal_block import (
        fused_temporal_block, reference_block)

    rng = np.random.default_rng(2)
    bstar, t, c, heads = 16, 32, 64, 8
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)
    args = (f(bstar, t, c), f(c) + 1.0, f(c), f(t, c),
            f(c, c), f(c, c), f(c, c), f(c, c), f(c))

    def loss_ref(*a):
        return (reference_block(*a, heads=heads) ** 2).sum()

    def loss_ker(*a):
        with pltpu.force_tpu_interpret_mode():
            return (fused_temporal_block(*a, heads, 16) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    g_ker = jax.grad(loss_ker, argnums=tuple(range(9)))(*args)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_motion_module_fused_matches_unfused():
    """The fused-block wiring in models/motion.py must be numerically and
    param-tree equivalent to the unfused path (init under either branch,
    apply under the other)."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.models.motion import TemporalModule

    rng = np.random.default_rng(7)
    m_plain = TemporalModule(in_channels=64, zero_initialize=False, fused=False)
    m_fused = TemporalModule(in_channels=64, zero_initialize=False, fused=True)
    x = jnp.asarray(rng.standard_normal((2 * 4, 6, 8, 64)).astype(np.float32))
    p = m_plain.init(jax.random.PRNGKey(3), x, 4)
    with pltpu.force_tpu_interpret_mode():
        p_f = m_fused.init(jax.random.PRNGKey(3), x, 4)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_f)
    want = m_plain.apply(p, x, 4)
    with pltpu.force_tpu_interpret_mode():
        got = m_fused.apply(p, x, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_fused_mlp_matches_reference_interpret():
    """kernels/fused_mlp.py — the serving-only fc1->gelu->fc2 fusion —
    must match the XLA composition it replaces (same f32-accumulated
    GEMMs + exact gelu) in Pallas interpret mode, at an M that pads."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels.fused_mlp import fused_mlp, mlp_reference

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 321, 128)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((128, 512)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((512,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((128,)).astype(np.float32) * 0.1)
    ref = np.asarray(mlp_reference(x, w1, b1, w2, b2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mlp(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_fused_mlp_whole_model_deviation(monkeypatch):
    """ENDODAV_FUSED_MLP=1 on a merged-graph EndoDAV: bounded disparity
    deviation vs the unfused graph (the fused kernel keeps the hidden in
    f32 through gelu where XLA rounds to bf16 — tiny, not zero).  On CPU
    suites fused_mlp's pallas_call can't run, so this exercises the
    dispatch gating only when a TPU is present; the numeric bound runs
    under interpret mode at module level instead."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.models.vit import Mlp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 40, 64)).astype(np.float32))
    m = Mlp(256, 64, lora_variant="none", dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.delenv("ENDODAV_FUSED_MLP", raising=False)
    base = np.asarray(m.apply(v, x), np.float32)
    mf = Mlp(256, 64, lora_variant="none", dtype=jnp.bfloat16, fused_mlp=True)
    with pltpu.force_tpu_interpret_mode():
        # the dispatch also gates on backend; force the route for the
        # numeric comparison
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        got = np.asarray(mf.apply(v, x), np.float32)
        # identical param tree either way
        assert jax.tree_util.tree_structure(mf.init(jax.random.PRNGKey(0), x)) \
            == jax.tree_util.tree_structure(v)
    np.testing.assert_allclose(got, base, atol=2e-2, rtol=2e-2)
