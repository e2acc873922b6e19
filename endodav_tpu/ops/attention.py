"""Multi-head attention dispatch: Pallas flash kernel on TPU, XLA fallback.

This is the framework's counterpart of the reference's only native-kernel
surface — xformers `memory_efficient_attention` for the spatial ViT
(models/backbones/layers/attention.py:72-89) and the temporal motion
modules (models/endodav/motion_module/attention.py:256-293).

Two very different shapes flow through here (SURVEY.md §2.5):
  * spatial ViT: B up to B*T(=32+), N ≈ 321 (224x280/14² + cls), Dh 64
  * temporal:    B = B*H*W (huge), N = T = 32 (tiny), Dh = C/8

For the temporal layout a sequence-tiled flash kernel is pointless — the
whole (32, Dh) tile fits in VMEM; throughput comes from batching the grid
over the B*H*W axis, which `kernels/flash_attention.py` does.  The XLA
path below is used on CPU and as a correctness oracle.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
from endodav_tpu.utils.envflags import env_on

__all__ = ["multi_head_attention", "fused_qkv_attention"]


def _warn_fallback(entry: str, exc: Exception) -> None:
    """The XLA fallback keeps serving alive when a Pallas path fails to
    trace/lower, but it must never do so silently — a quiet downgrade
    masks kernel regressions (and makes kernel-vs-XLA A/Bs compare XLA
    to XLA while reporting parity).  Once per entry point per process."""
    warnings.warn(
        f"endodav_tpu: Pallas {entry} failed "
        f"({type(exc).__name__}: {exc}); falling back to the XLA "
        "attention path — serving will be slower",
        RuntimeWarning,
        stacklevel=3,
    )


def fused_qkv_attention(x, w, bias, heads: int,
                        scale: float | None = None,
                        quant_int8: bool = False) -> jnp.ndarray:
    """Fused-QKV MHSA over x [B, N, C] with one packed projection
    w [C, 3C] (+ optional bias [3C]); returns [B, N, H, Dh].

    ``quant_int8``: the RESOLVED int8 decision from the calling module
    (models/vit.py:SpatialAttention resolves model flag + env override
    once) — projections ride the int8 MXU when set.

    On TPU this routes to the flash kernel's qkv entry, which pads x once
    and projects q/k/v from weight-column slices at padded length —
    eliminating the per-layer qkv activation slices / reshape copies /
    separate K/V row pads (~22 ms of the 518px serving chunk).  The
    fallback computes the identical math via XLA (CPU, tiny N, or
    ENDODAV_NO_FLASH=1).
    """
    import os

    b, n, c = x.shape
    use_pallas = (jax.default_backend() == "tpu"
                  and not env_on("ENDODAV_NO_FLASH") and n > 64)
    if use_pallas:
        try:
            from endodav_tpu.kernels.flash_attention import qkv_flash_attention

            return qkv_flash_attention(x, w, bias, heads, scale,
                                       quant_int8=quant_int8)
        except Exception as e:
            _warn_fallback("qkv_flash_attention", e)
    from endodav_tpu.ops.quant import int8_dense

    if quant_int8:
        qkv = int8_dense(x, w, bias, out_dtype=x.dtype)
    else:
        qkv = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())))
        if bias is not None:
            qkv = qkv + bias.astype(qkv.dtype)
    # head dim from the weight, not x: under tensor parallelism the local
    # w is [C, 3*C/g] while x keeps the full C (parallel/tp.py)
    dh = w.shape[-1] // 3 // heads
    qkv = qkv.reshape(b, n, 3, heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if scale is None:
        scale = dh ** -0.5
    return _xla_attention(q, k, v, scale)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Attention over [B, N, H, Dh] tensors; returns [B, N, H, Dh].

    ``scale`` defaults to Dh**-0.5 (matching both reference attention
    implementations).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        import os

        use_pallas = (jax.default_backend() == "tpu"
                      and not env_on("ENDODAV_NO_FLASH"))
    if use_pallas and q.shape[1] > 64:
        try:
            from endodav_tpu.kernels.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception as e:
            _warn_fallback("flash_attention", e)
    # Tiny-sequence / huge-batch regime (temporal modules, T=32): an
    # attention-only Pallas kernel loses to XLA's batched GEMM here (the
    # (R,T,H,dh) fold relayouts dominate at tiny head dims — round-1
    # measurement, kernels/temporal_attention.py).  The production route
    # for this regime is the *fused block* kernel instead
    # (kernels/fused_temporal_block.py, dispatched by models/motion.py),
    # which fuses LN+PE+QKV+attn+out-proj+residual in one VMEM residency
    # — measured 13% whole-model 518px speedup (PERFORMANCE.md).  This
    # XLA path remains for RoPE and non-TPU backends.
    return _xla_attention(q, k, v, scale)
