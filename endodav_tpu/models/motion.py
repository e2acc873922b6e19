"""Temporal attention ("motion") modules, TPU-first.

Re-design of the AnimateDiff-derived temporal transformer the reference
interleaves into its DPT pyramid (models/endodav/motion_module/
motion_module.py: TemporalModule:32, TemporalTransformer3DModel:68,
TemporalTransformerBlock:129, PositionalEncoding:180, TemporalAttention:200;
attention.py: CrossAttention:30, FeedForward/GEGLU:296-400, RoPE:403-429).

Layout: the reference shuttles [B,C,T,H,W] <-> [(B·T),C,H,W] <->
[(B·d),T,C] with einops rearranges.  Here feature maps stay channels-last
[B·T, H, W, C] end-to-end and the attention runs on [B·H·W, T, C] — a
huge-batch / tiny-sequence (T=32) problem where throughput comes from
batching heads over the MXU, not from sequence tiling (SURVEY.md §2.5).

`zero_initialize` zero-inits proj_out so a freshly added motion module is
an exact identity (motion_module.py:57-58) — unit-tested.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.models.lora import LoRADense
from endodav_tpu.ops.attention import multi_head_attention
from endodav_tpu.utils.envflags import env_on

__all__ = ["TemporalModule", "sinusoidal_time_encoding", "rope_tables"]


def _use_fused_block(pos_embedding_type: str, dim: int) -> bool:
    """Route the APE attention sub-block to the fused Pallas kernel on TPU.

    Measured on v5e (tools/bench_temporal_kernel.py, bench_fused_e2e.py,
    PERFORMANCE.md): the fused LN+PE+QKV+attention+out-proj+residual
    kernel beats XLA at every vits motion shape (1.2-3.1x chained micro,
    +13.3% whole-model at 518px).  vitl widths (C=1024) route to the
    head-grouped variant (round-3 sweep: 1.7-2.8x at 518px C=1024,
    7-9x at its C=256 paths).  ENDODAV_NO_FUSED=1 forces the XLA path
    (A/B + debugging).
    """
    import os

    if env_on("ENDODAV_NO_FUSED"):
        return False
    return jax.default_backend() == "tpu" and pos_embedding_type == "ape"


class _DenseParams(nn.Module):
    """Declares exactly the param tree of ``nn.Dense`` (kernel [in,out] +
    optional bias) but returns the raw arrays instead of computing, so the
    fused kernel can consume them.  Checkpoint paths stay identical whether
    the fused or the unfused branch built the tree."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class _LayerNormParams(nn.Module):
    """``nn.LayerNorm``'s param tree (scale/bias), raw."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


def sinusoidal_time_encoding(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] sin/cos APE (motion_module.py:180-198)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


def rope_tables(dim: int, max_len: int, theta: float = 10000.0):
    """(cos, sin) tables [max_len, dim/2] (attention.py:403-409)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    t = np.arange(max_len, dtype=np.float64)
    ang = np.outer(t, freqs)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate channel pairs of [B, T, C] by the tables (attention.py:420-429)."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    a, b = xr[..., 0], xr[..., 1]
    out_a = a * cos - b * sin
    out_b = a * sin + b * cos
    return jnp.stack([out_a, out_b], axis=-1).reshape(x.shape)


class TemporalAttention(nn.Module):
    """Self-attention along the time axis of [B·HW, T, C] tokens."""

    dim: int
    num_heads: int = 8
    temporal_max_len: int = 32
    pos_embedding_type: str = "ape"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fused_ln=None):  # [B*, T, C]
        bstar, t, c = x.shape
        if fused_ln is not None:
            # Fused residual sub-block: returns x + Attn(LN(x)+pe) Wo + bo
            # in one Pallas kernel (kernels/fused_temporal_block.py).  The
            # caller passes the LayerNorm params; pe is applied inside.
            from endodav_tpu.kernels.fused_temporal_block import (
                default_rows, fused_temporal_block)

            scale, bias = fused_ln
            pe = jnp.asarray(sinusoidal_time_encoding(self.temporal_max_len, self.dim))[:t]
            wq, _ = _DenseParams(self.dim, use_bias=False, name="to_q")(c)
            wk, _ = _DenseParams(self.dim, use_bias=False, name="to_k")(c)
            wv, _ = _DenseParams(self.dim, use_bias=False, name="to_v")(c)
            wo, bo = _DenseParams(self.dim, use_bias=True, name="to_out")(c)
            cast = lambda a: a.astype(self.dtype)
            return fused_temporal_block(
                x, scale.astype(jnp.float32), bias.astype(jnp.float32),
                pe.astype(jnp.float32), cast(wq), cast(wk), cast(wv),
                cast(wo), cast(bo), self.num_heads, default_rows(c, bstar))
        if self.pos_embedding_type == "ape":
            pe = jnp.asarray(sinusoidal_time_encoding(self.temporal_max_len, self.dim))
            x = x + pe[None, :t].astype(x.dtype)

        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(x)

        if self.pos_embedding_type == "rope":
            cos, sin = rope_tables(self.dim, self.temporal_max_len)
            cos = jnp.asarray(cos)[None, :t].astype(x.dtype)
            sin = jnp.asarray(sin)[None, :t].astype(x.dtype)
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)

        dh = self.dim // self.num_heads
        q = q.reshape(bstar, t, self.num_heads, dh)
        k = k.reshape(bstar, t, self.num_heads, dh)
        v = v.reshape(bstar, t, self.num_heads, dh)
        out = multi_head_attention(q, k, v).reshape(bstar, t, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (attention.py:296-400); the out projection optionally
    carries a LoRA adapter (`temporal_lora`, endodav.py:119-137)."""

    dim: int
    mult: int = 4
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dash_phase2: bool = False):
        inner = self.dim * self.mult
        h = nn.Dense(2 * inner, dtype=self.dtype, name="proj_in")(x)
        value, gate = jnp.split(h, 2, axis=-1)
        h = value * jax.nn.gelu(gate, approximate=False)
        return LoRADense(
            self.dim, r=self.lora_rank, lora_alpha=self.lora_alpha,
            variant=self.lora_variant, dtype=self.dtype, name="proj_out",
        )(h, dash_phase2)


class TemporalTransformerBlock(nn.Module):
    dim: int
    num_heads: int = 8
    num_attention_blocks: int = 2
    temporal_max_len: int = 32
    pos_embedding_type: str = "ape"
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    dtype: Any = jnp.float32

    fused: bool | None = None  # None = auto (TPU + APE + inference); tests force

    @nn.compact
    def __call__(self, x, dash_phase2: bool = False, train: bool = False):  # [B*, T, C]
        fused = self.fused
        if fused is None:
            # auto-fuse only at inference: the kernel's backward recomputes
            # the XLA oracle (custom_vjp), which costs one extra forward vs
            # XLA autodiff reusing its own intermediates — a likely net
            # loss inside the train step until measured otherwise.
            # ENDODAV_FUSED_TRAIN=1 opts the train step in (A/B switch).
            import os
            allow_train = env_on("ENDODAV_FUSED_TRAIN")
            fused = ((not train or allow_train)
                     and _use_fused_block(self.pos_embedding_type, self.dim))
        for i in range(self.num_attention_blocks):
            attn = TemporalAttention(
                self.dim, self.num_heads, self.temporal_max_len,
                self.pos_embedding_type, dtype=self.dtype, name=f"attn_{i}",
            )
            if fused:
                ln = _LayerNormParams(name=f"norm_{i}")(self.dim)
                x = attn(x, fused_ln=ln)
            else:
                y = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(x)
                x = x + attn(y)
        y = nn.LayerNorm(dtype=self.dtype, name="ff_norm")(x)
        x = x + GEGLUFeedForward(
            self.dim, lora_variant=self.lora_variant, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, dtype=self.dtype, name="ff",
        )(y, dash_phase2)
        return x


class TemporalModule(nn.Module):
    """GroupNorm -> proj_in -> temporal transformer -> zero-init proj_out,
    with a residual over the whole stack (motion_module.py:102-126).

    __call__ takes channels-last frame-major maps [B·T, H, W, C] plus the
    static frame count T and returns the same shape.
    """

    in_channels: int
    num_attention_heads: int = 8
    num_transformer_block: int = 1
    num_attention_blocks: int = 2
    norm_num_groups: int = 32
    temporal_max_len: int = 32
    zero_initialize: bool = True
    pos_embedding_type: str = "ape"
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    dtype: Any = jnp.float32
    fused: bool | None = None  # forwarded to TemporalTransformerBlock

    @nn.compact
    def __call__(self, x, frames: int, dash_phase2: bool = False, train: bool = False):
        bt, h, w, c = x.shape
        b = bt // frames
        residual = x

        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        y = y.reshape(bt, h * w, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y)

        # [(B·T), HW, C] -> [(B·HW), T, C]: time becomes the sequence axis.
        y = y.reshape(b, frames, h * w, c).swapaxes(1, 2).reshape(b * h * w, frames, c)
        for d in range(self.num_transformer_block):
            y = TemporalTransformerBlock(
                c, self.num_attention_heads, self.num_attention_blocks,
                self.temporal_max_len, self.pos_embedding_type,
                self.lora_variant, self.lora_rank, self.lora_alpha,
                dtype=self.dtype, fused=self.fused,
                name=f"transformer_blocks_{d}",
            )(y, dash_phase2, train)
        y = y.reshape(b, h * w, frames, c).swapaxes(1, 2).reshape(bt, h * w, c)

        proj_out = nn.Dense(
            c, dtype=self.dtype, name="proj_out",
            **({"kernel_init": nn.initializers.zeros} if self.zero_initialize else {}),
        )
        y = proj_out(y).reshape(bt, h, w, c)
        return y + residual
