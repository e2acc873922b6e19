"""int8 serving GEMM path (ops/quant.py, ENDODAV_INT8=1).

Bounds the quantization error at the op level and at whole-model
granularity, and pins that the flag actually reroutes the ViT
projections (a silent no-op would make the device A/B compare bf16 to
bf16 while reporting an int8 result).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endodav_tpu.ops.quant import int8_dense, quantize_weight

RNG = np.random.default_rng(7)


def test_quantize_weight_roundtrip_bound():
    w = jnp.asarray(RNG.standard_normal((64, 96)).astype(np.float32))
    w8, scale = quantize_weight(w)
    assert w8.dtype == jnp.int8 and scale.shape == (96,)
    deq = np.asarray(w8, np.float32) * np.asarray(scale)[None, :]
    # symmetric per-channel: error bounded by half a quantization step
    step = np.asarray(scale)[None, :]
    assert np.all(np.abs(deq - np.asarray(w)) <= 0.5 * step + 1e-7)


def test_int8_dense_error_bound():
    x = jnp.asarray(RNG.standard_normal((128, 256)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((256, 192)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((192,)).astype(np.float32))
    y_exact = np.asarray(x @ w + b)
    y_q = np.asarray(int8_dense(x, w, b))
    rel = np.linalg.norm(y_q - y_exact) / np.linalg.norm(y_exact)
    assert rel < 0.02, rel
    assert not np.allclose(y_q, y_exact)  # the int8 path actually ran


def test_int8_dense_zero_rows_no_nan():
    x = jnp.zeros((4, 32))
    w = jnp.asarray(RNG.standard_normal((32, 16)).astype(np.float32))
    y = np.asarray(int8_dense(x, w))
    assert np.all(np.isfinite(y)) and np.all(y == 0)


def test_int8_dense_batched_shapes():
    x = jnp.asarray(RNG.standard_normal((2, 5, 48)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((48, 24)).astype(np.float32))
    y = int8_dense(x, w, out_dtype=jnp.bfloat16)
    assert y.shape == (2, 5, 24) and y.dtype == jnp.bfloat16


def test_int8_dense_uses_integer_dot():
    """The contraction must be an int8->int32 dot (the MXU-rate path),
    not a dequantize-then-float matmul."""
    x = jnp.zeros((8, 32))
    w = jnp.zeros((32, 16))
    jaxpr = jax.make_jaxpr(lambda a, b: int8_dense(a, b))(x, w)
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "no dot_general in int8_dense"
    assert any(e.params.get("preferred_element_type") == jnp.int32 for e in dots)


@pytest.fixture(scope="module")
def tiny_endodav_out():
    from endodav_tpu.models import EndoDAV

    # module-scoped + T=2 at 28x42: the fixture's full-model init was the
    # 4th-slowest fast-suite item (33 s setup) and two tests now share it
    m = EndoDAV(encoder="vits", image_shape=(28, 42), num_frames=2,
                lora_type="none")
    x = jnp.asarray(RNG.uniform(0, 1, (1, 2, 28, 42, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, variables, x


def test_endodav_int8_whole_model_deviation(tiny_endodav_out, monkeypatch):
    """ENDODAV_INT8=1 engages (output changes) and stays close (bounded
    disparity deviation) on the merged-serving graph."""
    m, variables, x = tiny_endodav_out
    monkeypatch.delenv("ENDODAV_INT8", raising=False)
    d0 = np.asarray(m.apply(variables, x)[("disp", 0)], np.float32)
    monkeypatch.setenv("ENDODAV_INT8", "1")
    d1 = np.asarray(m.apply(variables, x)[("disp", 0)], np.float32)
    diff = np.abs(d1 - d0)
    assert diff.max() > 0, "int8 flag did not reroute any GEMM"
    # sigmoid disparity lives in [0,1]; random-weight deviation stays small
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 0.01, diff.mean()


def test_int8_enabled_falsy_spellings(monkeypatch):
    """Opt-IN flag: ENDODAV_INT8=0/false must mean OFF, or an A/B driven
    as 1-vs-0 compares int8 to int8."""
    from endodav_tpu.ops.quant import int8_enabled

    for off in ("0", "false", "False", "off", "no", "", "  "):
        monkeypatch.setenv("ENDODAV_INT8", off)
        assert not int8_enabled(), repr(off)
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("ENDODAV_INT8", on)
        assert int8_enabled(), repr(on)


def test_fused_qkv_int8_matches_fallback_interpret(monkeypatch):
    """The production TPU path — int8 projection inside qkv_flash_attention
    (padded length, shared x quantization) — vs the XLA-fallback int8
    path, in Pallas interpret mode.  CPU-only suites never enter the
    fused branch otherwise."""
    from jax.experimental.pallas import tpu as pltpu

    from endodav_tpu.kernels.flash_attention import qkv_flash_attention
    from endodav_tpu.ops.attention import fused_qkv_attention

    monkeypatch.setenv("ENDODAV_INT8", "1")
    b, n, c, h = 1, 200, 128, 2  # dh=64, the kernel's lane-slice width
    x = jnp.asarray(RNG.standard_normal((b, n, c)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((3 * c,)).astype(np.float32) * 0.1)
    fallback = np.asarray(fused_qkv_attention(x, w, bias, h))
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(qkv_flash_attention(x, w, bias, h))
    np.testing.assert_allclose(fused, fallback, atol=3e-5)


def test_vitblock_rejects_non_dividing_tp_groups():
    from endodav_tpu.models.vit import ViTBlock

    blk = ViTBlock(384, 6, (4, 5), tp_groups=4)  # 6 heads % 4 != 0
    x = jnp.zeros((1, 21, 384))
    with pytest.raises(ValueError, match="tp_groups"):
        blk.init(jax.random.PRNGKey(0), x)


def test_trainer_strips_int8_flag(monkeypatch, capsys):
    """A training process that inherited the serving-only flag must strip
    it (zero-gradient round() would silently freeze the trunk)."""
    import os

    from endodav_tpu.train.trainer import Trainer

    monkeypatch.setenv("ENDODAV_INT8", "1")
    # __init__ strips the env before any heavy work; the assert that
    # follows it aborts the (expensive) model build for this test
    class _BadOpts:
        height, width = 33, 32  # fails the %32 assert right after the guard
        frame_ids = [0]
        log_dir, model_type = "/tmp/q", "endodav"

    with pytest.raises(AssertionError):
        Trainer(_BadOpts())
    assert "ENDODAV_INT8" not in os.environ
    assert "serving-only" in capsys.readouterr().out


def test_lora_variants_ignore_quant_flag(monkeypatch):
    """Unmerged adapter variants keep the f32/bf16 path: quant is scoped
    to the merged (variant='none') serving graph."""
    from endodav_tpu.models.lora import LoRADense

    x = jnp.asarray(RNG.standard_normal((4, 16)).astype(np.float32))
    layer = LoRADense(8, variant="dvlora", r=2, quant_int8=True)
    p = layer.init(jax.random.PRNGKey(0), x)
    ref = LoRADense(8, variant="dvlora", r=2).apply(p, x)
    np.testing.assert_array_equal(np.asarray(layer.apply(p, x)), np.asarray(ref))


def test_vitl_merged_serving_defaults_int8(monkeypatch):
    """depth_window_forward must auto-enable the int8 serving GEMMs for
    the vitl MERGED graph (round-4 device A/B: +9%) by cloning the MODEL
    with int8_serving=True — never by mutating os.environ (the round-4
    advisor finding: a process-global write leaked the vitl default into
    vits engines built later) — leave vits alone, and honor an explicit
    ENDODAV_INT8=0 opt-out."""
    import os

    from endodav_tpu.eval.engine import depth_window_forward

    class Stub:
        encoder = "vitl"
        lora_type = "none"
        image_shape = (28, 28)

        def clone(self, **updates):
            out = Stub()
            out.encoder = self.encoder
            out.lora_type = self.lora_type
            vars(out).update(updates)
            return out

    monkeypatch.setenv("ENDODAV_SCAN_TRUNK", "0")
    monkeypatch.setenv("ENDODAV_SPLIT_COMPILE", "0")
    monkeypatch.delenv("ENDODAV_INT8", raising=False)

    captured = {}

    class Recorder(Stub):
        def clone(self, **updates):
            captured.update(updates)
            return super().clone(**updates)

    depth_window_forward(Recorder(), {}, "endodav")
    assert captured == {"int8_serving": True}
    assert "ENDODAV_INT8" not in os.environ  # no env mutation, ever

    # explicit env override (either value) suppresses the auto-clone
    captured.clear()
    monkeypatch.setenv("ENDODAV_INT8", "0")
    depth_window_forward(Recorder(), {}, "endodav")
    assert captured == {}
    monkeypatch.delenv("ENDODAV_INT8", raising=False)

    # vits untouched
    captured.clear()
    vits = Recorder()
    vits.encoder = "vits"
    depth_window_forward(vits, {}, "endodav")
    assert captured == {}
    assert "ENDODAV_INT8" not in os.environ


def test_resolve_int8_env_overrides_model_flag(monkeypatch):
    """Resolution order: explicitly set env wins both ways; otherwise the
    model-threaded flag decides; default off."""
    from endodav_tpu.ops.quant import resolve_int8

    monkeypatch.delenv("ENDODAV_INT8", raising=False)
    assert resolve_int8(None) is False
    assert resolve_int8(False) is False
    assert resolve_int8(True) is True
    monkeypatch.setenv("ENDODAV_INT8", "0")
    assert resolve_int8(True) is False  # env forces off
    monkeypatch.setenv("ENDODAV_INT8", "1")
    assert resolve_int8(False) is True  # env forces on


def test_endodav_int8_serving_field_scoped(tiny_endodav_out, monkeypatch):
    """EndoDAV(int8_serving=True) reroutes the trunk GEMMs with NO env
    state, and a second plain model in the same process is unaffected
    (the scoping the round-4 advisor asked for)."""
    m, variables, x = tiny_endodav_out
    monkeypatch.delenv("ENDODAV_INT8", raising=False)
    d_bf16 = np.asarray(m.apply(variables, x)[("disp", 0)], np.float32)
    m8 = m.clone(int8_serving=True)
    d_int8 = np.asarray(m8.apply(variables, x)[("disp", 0)], np.float32)
    diff = np.abs(d_int8 - d_bf16)
    assert diff.max() > 0, "int8_serving did not reroute any GEMM"
    assert diff.max() < 0.05, diff.max()
    # same process, plain model again: bit-identical to the first run
    d_again = np.asarray(m.apply(variables, x)[("disp", 0)], np.float32)
    np.testing.assert_array_equal(d_again, d_bf16)
