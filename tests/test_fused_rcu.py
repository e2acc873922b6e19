"""Fused ResidualConvUnit kernel (kernels/fused_rcu.py) vs the XLA oracle.

Interpret-mode parity across band/edge geometries, gradient parity of
the custom_vjp recompute, and the dpt.py refactor's invariants: the
manual-conv composition is numerically identical to the old nn.Conv
modules and the param tree kept nn.Conv's names/shapes (checkpoint
format unchanged).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endodav_tpu.kernels.fused_rcu import fused_rcu, rcu_reference

RNG = np.random.default_rng(11)


def _params(c):
    w1 = jnp.asarray(RNG.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(RNG.standard_normal((c,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(RNG.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(RNG.standard_normal((c,)).astype(np.float32) * 0.1)
    return w1, b1, w2, b2


@pytest.mark.parametrize("b,h,w,c,bh", [
    (2, 16, 24, 64, 8),    # even bands
    (1, 10, 24, 64, 8),    # H not a band multiple (padded band + clip)
    (1, 6, 16, 64, 8),     # H smaller than the band
    (2, 9, 8, 128, 4),     # odd H, C=128 upper bound
])
def test_fused_rcu_matches_xla(b, h, w, c, bh):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    w1, b1, w2, b2 = _params(c)
    ref = rcu_reference(x, w1, b1, w2, b2)
    out = fused_rcu(x, w1, b1, w2, b2, bh, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_rcu_gradients_match_reference():
    x = jnp.asarray(RNG.standard_normal((1, 8, 16, 64)).astype(np.float32))
    w1, b1, w2, b2 = _params(64)

    def loss_fused(x, w1, b1, w2, b2):
        return (fused_rcu(x, w1, b1, w2, b2, 8, True) ** 2).mean()

    def loss_ref(x, w1, b1, w2, b2):
        return (rcu_reference(x, w1, b1, w2, b2) ** 2).mean()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-5, atol=1e-6)


def test_rcu_module_matches_nn_conv_composition(monkeypatch):
    """The dpt.py refactor (raw params + lax conv) must equal the old
    nn.Conv composition bit-for-bit given the same params."""
    import flax.linen as nn

    # this pins the PARAM REFACTOR, not the kernel: on a real-TPU suite
    # run an exported ENDODAV_FUSED_RCU would reroute apply() and fail
    # the bit-exact assert on accumulation order
    monkeypatch.delenv("ENDODAV_FUSED_RCU", raising=False)

    from endodav_tpu.models.dpt import ResidualConvUnit

    c = 32
    x = jnp.asarray(RNG.standard_normal((2, 12, 14, c)).astype(np.float32))
    rcu = ResidualConvUnit(c)
    v = rcu.init(jax.random.PRNGKey(0), x)

    class OldRCU(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            y = jax.nn.relu(x)
            y = nn.Conv(self.features, (3, 3), name="conv1")(y)
            y = jax.nn.relu(y)
            y = nn.Conv(self.features, (3, 3), name="conv2")(y)
            return y + x

    old = OldRCU(c)
    v_old = old.init(jax.random.PRNGKey(0), x)
    # same names + same init seed stream => identical params
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), v, v_old)
    np.testing.assert_array_equal(np.asarray(rcu.apply(v, x)),
                                  np.asarray(old.apply(v_old, x)))


def test_rcu_param_tree_unchanged():
    from endodav_tpu.models.dpt import ResidualConvUnit

    v = ResidualConvUnit(64).init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))
    p = v["params"]
    assert set(p) == {"conv1", "conv2"}
    assert p["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert p["conv1"]["bias"].shape == (64,)


def test_fused_rcu_bf16_tolerance():
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, 64)), jnp.bfloat16)
    w1, b1, w2, b2 = _params(64)
    ref = np.asarray(rcu_reference(x, w1, b1, w2, b2), np.float32)
    out = np.asarray(fused_rcu(x, w1, b1, w2, b2, 8, True), np.float32)
    # bf16 storage, f32 accumulation in both paths; bias-add order differs
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
