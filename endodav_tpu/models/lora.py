"""Low-rank adaptation family as parameter-transform Dense layers.

Re-designs the reference's LoRA zoo (models/backbones/mylora/layers.py:
Linear:92, DVLinear:324, Linear_SSB:396, DashLinear:497) as stateless flax
modules.  The stateful pieces of the originals — requires_grad flipping and
DashLinear's in-forward SVD counter — are *not* modelled inside the layer:
trainability schedules live in `train/optim.py` as step-indexed gradient
gates, and the Dash SVD switch is an explicit host-side phase boundary
(`dash_svd_update`), keeping every forward pure and jit-compiled.

Parameter naming mirrors the reference's state-dict keys (lora_A, lora_B,
lora_U, lora_V, lora_index, weight_u_top, weight_vt_top) so checkpoints
convert 1:1 and the trainability-mask patterns match SURVEY.md §2.1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LoRADense", "LoRAConv", "LoRAEmbed", "dash_svd_update", "merge_lora_params"]


def _kaiming_uniform_sqrt5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a (rows, cols) matrix.

    torch computes fan_in = cols and bound = 1/sqrt(fan_in) for a=sqrt(5).
    """
    fan_in = shape[-1]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LoRADense(nn.Module):
    """Dense layer with a frozen base kernel and a low-rank trainable delta.

    variant:
      * "none"   — plain dense (no adapter params)
      * "lora"   — y += x A^T B^T * alpha/r
      * "dvlora" — y += x (A∘U)^T (B∘V)^T * alpha/r   (DV-LoRA)
      * "ssb"    — kernel scaled per-row/col: K' = a ⊙ K ⊙ b
      * "dash"   — lora plus top-8 singular-direction term, gated by
                   ``dash_phase2`` (the reference's FLAG>warmup branch)
      * "galora" — gated LoRA: the delta passes through a SiLU gate
                   delta*sigmoid(delta) (models/backbones/galora.py:129-142)
      * "flora"  — SVD-style A/E/B factorisation with ranknum scaling
                   (mylora Linear_FLora :433-495)

    The base kernel is stored transposed relative to torch (in, out) —
    flax convention; the converter transposes.
    """

    features: int
    r: int = 4
    lora_alpha: float | None = None
    variant: str = "lora"
    use_bias: bool = True
    dash_index: int = 8
    dtype: Any = jnp.float32
    # serving-only int8 GEMM path (ops/quant.py); set by the ViT MLP when
    # ENDODAV_INT8=1 — only meaningful for variant="none" (the merged-LoRA
    # serving graph), where the whole layer is one large token-space GEMM
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, dash_phase2: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        y_bias = 0.0
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y_bias = bias.astype(self.dtype)

        xd = x.astype(self.dtype)

        if self.variant == "ssb":
            a = self.param("lora_A", nn.initializers.ones, (in_features, 1), jnp.float32)
            b = self.param("lora_B", nn.initializers.ones, (self.features, 1), jnp.float32)
            k = (a * kernel * b[:, 0][None, :]).astype(self.dtype)
            return xd @ k + y_bias

        if self.variant == "none" and self.quant_int8:
            from endodav_tpu.ops.quant import int8_dense

            return int8_dense(xd, kernel, bias if self.use_bias else None,
                              out_dtype=self.dtype)

        y = xd @ kernel.astype(self.dtype) + y_bias
        if self.variant == "none":
            return y

        alpha = self.lora_alpha if self.lora_alpha is not None else 2.0 * self.r

        if self.variant == "flora":
            lora_a = self.param("lora_A", nn.initializers.normal(0.02), (self.r, in_features), jnp.float32)
            lora_e = self.param("lora_E", nn.initializers.zeros, (self.r, self.r), jnp.float32)
            lora_b = self.param("lora_B", nn.initializers.normal(0.02), (self.features, self.r), jnp.float32)
            scale = (alpha if alpha > 0 else float(self.r)) / (self.r + 1e-5)
            delta = (xd @ lora_a.T.astype(self.dtype)) @ lora_e.T.astype(self.dtype) @ lora_b.T.astype(self.dtype)
            return (y + delta * scale).astype(x.dtype)

        scaling = alpha / self.r
        lora_a = self.param("lora_A", _kaiming_uniform_sqrt5, (self.r, in_features), jnp.float32)
        lora_b = self.param("lora_B", nn.initializers.zeros, (self.features, self.r), jnp.float32)

        if self.variant == "galora":
            delta = (xd @ lora_a.T.astype(self.dtype) @ lora_b.T.astype(self.dtype)) * scaling
            return (y + delta * jax.nn.sigmoid(delta)).astype(x.dtype)

        if self.variant == "dvlora":
            lora_u = self.param(
                "lora_U", lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -1.0, 1.0), (self.r, 1)
            )
            lora_v = self.param(
                "lora_V", lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -1.0, 1.0), (self.features, 1)
            )
            a_eff = (lora_a * lora_u).astype(self.dtype)
            b_eff = (lora_b * lora_v).astype(self.dtype)
        elif self.variant in ("lora", "dash"):
            a_eff = lora_a.astype(self.dtype)
            b_eff = lora_b.astype(self.dtype)
        else:
            raise ValueError(f"unknown lora variant: {self.variant}")

        y = y + (xd @ a_eff.T @ b_eff.T) * scaling

        if self.variant == "dash":
            lora_index = self.param("lora_index", nn.initializers.zeros, (self.dash_index,), jnp.float32)
            u_top = self.param(
                "weight_u_top", nn.initializers.zeros, (self.features, self.dash_index), jnp.float32
            )
            vt_top = self.param(
                "weight_vt_top", nn.initializers.zeros, (self.dash_index, in_features), jnp.float32
            )
            if dash_phase2:
                delta = (u_top * lora_index[None, :]) @ vt_top  # (out, in)
                y = y + xd @ delta.T.astype(self.dtype)
        return y.astype(x.dtype)


class LoRAConv(nn.Module):
    """Conv2d with a low-rank kernel delta (mylora Conv2d :264-322).

    The torch original factorises the flattened kernel as
    lora_B [out*k, r*k] @ lora_A [r*k, in*k] reshaped to the conv weight;
    we keep the same parameter shapes for checkpoint parity.
    """

    features: int
    kernel_size: int
    r: int = 4
    lora_alpha: float = 1.0
    strides: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features), jnp.float32
        )
        lora_a = self.param("lora_A", _kaiming_uniform_sqrt5, (self.r * k, in_ch * k), jnp.float32)
        lora_b = self.param("lora_B", nn.initializers.zeros, (self.features * k, self.r * k), jnp.float32)
        delta = (lora_b @ lora_a).reshape(self.features, in_ch, k, k)
        delta = jnp.transpose(delta, (2, 3, 1, 0))  # -> (kh, kw, in, out)
        w = (kernel + delta * (self.lora_alpha / self.r)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (self.strides, self.strides), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32).astype(self.dtype)
        return y.astype(x.dtype)


class LoRAEmbed(nn.Module):
    """Embedding with low-rank delta (mylora Embedding :32-89)."""

    num_embeddings: int
    features: int
    r: int = 4
    lora_alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (self.num_embeddings, self.features), jnp.float32
        )
        lora_a = self.param("lora_A", nn.initializers.zeros, (self.r, self.num_embeddings), jnp.float32)
        lora_b = self.param("lora_B", nn.initializers.normal(1.0), (self.features, self.r), jnp.float32)
        base = jnp.take(table, ids, axis=0)
        after_a = jnp.take(lora_a.T, ids, axis=0)  # [..., r]
        delta = after_a @ lora_b.T * (self.lora_alpha / self.r)
        return (base + delta).astype(self.dtype)


def dash_svd_update(params: dict, scaling: float | None = None) -> dict:
    """Host-side Dash phase boundary (mylora/layers.py:568-578, de-statefuled).

    For every LoRADense subtree with dash params, SVD the frozen kernel,
    rank the singular directions by |Δσ|/|σ| of the current LoRA delta and
    fill weight_u_top / weight_vt_top with the top-`index` directions.
    Returns a new params pytree.
    """
    import numpy as np

    def visit(tree):
        if isinstance(tree, dict):
            keys = set(tree.keys())
            if {"kernel", "lora_A", "lora_B", "weight_u_top", "weight_vt_top", "lora_index"} <= keys:
                k = np.asarray(tree["kernel"], dtype=np.float32)  # (in, out)
                w = k.T  # torch layout (out, in)
                a = np.asarray(tree["lora_A"], dtype=np.float32)
                b = np.asarray(tree["lora_B"], dtype=np.float32)
                r = a.shape[0]
                s = scaling if scaling is not None else 2.0
                delta_w = (b @ a) * s
                u, sigma, vt = np.linalg.svd(w, full_matrices=False)
                delta_sigma = np.diag(u.T @ delta_w @ vt.T)
                change_rate = np.abs(delta_sigma) / np.abs(sigma)
                top = np.argsort(-change_rate)[: tree["weight_u_top"].shape[1]]
                new = dict(tree)
                new["weight_u_top"] = jnp.asarray(u[:, top])
                new["weight_vt_top"] = jnp.asarray(vt[top, :])
                return new
            return {k2: visit(v) for k2, v in tree.items()}
        return tree

    return visit(params)


def merge_lora_params(params: dict, variant: str, r: int,
                      alpha: float | None = None,
                      dash_phase2: bool = False) -> dict:
    """Fold every LoRA delta into its frozen base kernel — exact at f32.

    For serving, the low-rank adapters are mathematically equivalent to a
    dense update of the base weight; merging removes the adapter matmuls
    from the forward entirely (measured 6.3% of the 518px window forward
    for dvlora, tools/bench_ablation.py).  Returns a params pytree whose
    LoRA subtrees carry only {kernel, bias} — exactly the tree a model
    built with ``lora_type='none'`` expects.

    `variant`/`r`/`alpha` are the model-wide settings (EndoDAV/EndoDAC
    use one alpha policy for every site, models/endodav.py:43-45,
    endodac.py:41-44).  ``galora`` cannot be merged (its delta passes
    through an input-dependent SiLU gate) and raises.
    """
    if variant == "galora":
        raise ValueError("galora deltas are input-gated and cannot be merged")
    if variant == "none":
        return params

    drop = {"lora_A", "lora_B", "lora_U", "lora_V", "lora_E",
            "lora_index", "weight_u_top", "weight_vt_top"}

    def visit(tree):
        if not isinstance(tree, dict):
            return tree
        keys = set(tree.keys())
        if "kernel" in keys and ("lora_A" in keys or "lora_B" in keys):
            k = jnp.asarray(tree["kernel"], jnp.float32)
            a = jnp.asarray(tree["lora_A"], jnp.float32)
            b = jnp.asarray(tree["lora_B"], jnp.float32)
            if k.ndim == 4:  # LoRAConv: delta reshaped onto the conv kernel
                out_ch, kk = k.shape[3], k.shape[0]
                conv_alpha = 1.0 if alpha is None else alpha
                delta = (b @ a).reshape(out_ch, k.shape[2], kk, kk)
                delta = jnp.transpose(delta, (2, 3, 1, 0))
                merged = k + delta * (conv_alpha / r)
            elif a.shape == (k.shape[0], 1) and b.shape == (k.shape[1], 1):
                # ssb: per-row/col scaling of the frozen kernel
                merged = a * k * b[:, 0][None, :]
            elif "lora_E" in keys:  # flora
                e = jnp.asarray(tree["lora_E"], jnp.float32)
                al = alpha if alpha is not None else 2.0 * r
                scale = (al if al > 0 else float(r)) / (r + 1e-5)
                merged = k + (a.T @ e.T @ b.T) * scale
            else:
                al = alpha if alpha is not None else 2.0 * r
                scaling = al / r
                if "lora_U" in keys:  # dvlora
                    a = a * jnp.asarray(tree["lora_U"], jnp.float32)
                    b = b * jnp.asarray(tree["lora_V"], jnp.float32)
                merged = k + (a.T @ b.T) * scaling
                if "lora_index" in keys and dash_phase2:
                    u_top = jnp.asarray(tree["weight_u_top"], jnp.float32)
                    vt_top = jnp.asarray(tree["weight_vt_top"], jnp.float32)
                    idx = jnp.asarray(tree["lora_index"], jnp.float32)
                    merged = merged + ((u_top * idx[None, :]) @ vt_top).T
            out = {k2: v for k2, v in tree.items() if k2 not in drop}
            out["kernel"] = merged.astype(jnp.asarray(tree["kernel"]).dtype)
            return out
        if "embedding" in keys and "lora_A" in keys:  # LoRAEmbed
            t_ = jnp.asarray(tree["embedding"], jnp.float32)
            a = jnp.asarray(tree["lora_A"], jnp.float32)
            b = jnp.asarray(tree["lora_B"], jnp.float32)
            al = 1.0 if alpha is None else alpha
            out = {k2: v for k2, v in tree.items() if k2 not in drop}
            out["embedding"] = (t_ + (a.T @ b.T) * (al / r)).astype(
                jnp.asarray(tree["embedding"]).dtype)
            return out
        return {k2: visit(v) for k2, v in tree.items()}

    return visit(params)
