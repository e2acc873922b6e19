"""DINOv2-style Vision Transformer, TPU-first (channels-last, static shapes).

One ViT for the whole framework — the reference carried three byte-similar
copies (models/backbones/vision_transformer.py, models/endodac/dinov2.py,
models/endodav/dinov2.py); SURVEY.md §2.1 calls for deduplication.

Reproduced behaviours (reference file:line):
  * patch embed 14x14 conv + cls token + bicubic-interpolated pos embed
    with the 0.1 offset workaround (vision_transformer.py:186-217)
  * `include_cls_token` toggle (:107, 225-227)
  * intermediate-layer taps with final LayerNorm applied per tap
    (get_intermediate_layers :305-333)
  * EndoDAC's ResBottleneck residual branch on patch tokens at selected
    blocks (backbones/layers/block.py:98-108,146-150), zero-initialised so
    adapted blocks start as identity (layers/utils.py:139-141)
  * LayerScale with init 1e-5 (vit factories :361)
  * LoRA adapters injected into every block MLP (endodav.py:102-118)

Layout: images enter as [B, H, W, 3] channels-last; tokens are [B, N, D].
All matmul-heavy ops run through `ops.attention` (Pallas on TPU).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from endodav_tpu.models.lora import LoRADense
from endodav_tpu.ops.attention import fused_qkv_attention
from endodav_tpu.ops.quant import int8_dense, resolve_int8
from endodav_tpu.ops.resize import resize2d

__all__ = ["DinoViT", "VIT_CONFIGS", "scan_trunk_apply"]

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


class _DenseParams(nn.Module):
    """Declares exactly LoRADense(variant='none')'s param tree (kernel
    [in, out] + bias, same names/inits) but returns the raw arrays so
    the fused-MLP kernel can consume both layers in one pallas_call
    without forking the checkpoint format."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class Mlp(nn.Module):
    """Transformer MLP; fc1/fc2 carry the LoRA adapters (endodav.py:104-118)."""

    hidden_features: int
    out_features: int
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    # tensor parallelism (parallel/tp.py): hidden_features is the LOCAL
    # width (global/g), fc2 emits a partial sum reduced over this axis
    # (its bias is pre-divided by g when the params are sharded)
    tp_axis: str | None = None
    # serving-only int8 GEMMs, threaded from the model config (env var
    # ENDODAV_INT8 is explicit override only — ops/quant.py:resolve_int8)
    quant_int8: bool = False
    # serving-only fused fc1->gelu->fc2 Pallas kernel (kernels/
    # fused_mlp.py): keeps the [rows, 4C] hidden VMEM-resident instead
    # of XLA's HBM round-trip.  Threaded from the model config like
    # quant_int8; ENDODAV_FUSED_MLP=0/1 is the explicit override.
    fused_mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dash_phase2: bool = False):
        quant = resolve_int8(self.quant_int8)
        from endodav_tpu.utils.envflags import env_auto

        use_fused = (env_auto("ENDODAV_FUSED_MLP", self.fused_mlp)
                     and self.lora_variant == "none" and not quant
                     and jax.default_backend() == "tpu")
        if use_fused:
            from endodav_tpu.kernels.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(self.hidden_features, name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_features, name="fc2")(self.hidden_features)
            y = fused_mlp(x.astype(self.dtype), w1.astype(self.dtype), b1,
                          w2.astype(self.dtype), b2)
            if self.tp_axis is not None:
                y = jax.lax.psum(y, self.tp_axis)
            return y
        x = LoRADense(
            self.hidden_features, r=self.lora_rank, lora_alpha=self.lora_alpha,
            variant=self.lora_variant, dtype=self.dtype, name="fc1",
            quant_int8=quant,
        )(x, dash_phase2)
        x = jax.nn.gelu(x, approximate=False)
        x = LoRADense(
            self.out_features, r=self.lora_rank, lora_alpha=self.lora_alpha,
            variant=self.lora_variant, dtype=self.dtype, name="fc2",
            quant_int8=quant,
        )(x, dash_phase2)
        if self.tp_axis is not None:
            x = jax.lax.psum(x, self.tp_axis)
        return x


class SwiGLUFFN(nn.Module):
    """SwiGLU FFN option (backbones/layers/swiglu_ffn.py:14-72) — the
    xformers 'fused' variant is a single 2*hidden projection; XLA fuses
    the gating elementwise into the matmuls, so one module covers both.
    Hidden width follows DINOv2: (2*4*d/3) rounded up to a multiple of 8.
    """

    hidden_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dash_phase2: bool = False):
        d = (int(self.hidden_features * 2 / 3) + 7) // 8 * 8
        w12 = nn.Dense(2 * d, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(w12, 2, axis=-1)
        return nn.Dense(self.out_features, dtype=self.dtype, name="w3")(jax.nn.silu(x1) * x2)


class _QKVParams(nn.Module):
    """Declares exactly nn.Dense's param tree (kernel [in, out] + optional
    bias) but returns the raw arrays, so the attention dispatch can slice
    the packed projection itself (checkpoint paths stay identical)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


class SpatialAttention(nn.Module):
    """Fused-QKV MHSA (backbones/layers/attention.py:36-69)."""

    dim: int
    num_heads: int  # LOCAL head count under tensor parallelism (global/g)
    qkv_bias: bool = True
    proj_bias: bool = True
    # tensor parallelism (parallel/tp.py): qkv/proj kernels hold the local
    # head-group columns/rows; proj emits a partial sum reduced over this
    # axis (its bias is pre-divided by g when the params are sharded)
    tp_axis: str | None = None
    tp_groups: int = 1
    # serving-only int8 GEMMs, threaded from the model config (env var
    # ENDODAV_INT8 is explicit override only — ops/quant.py:resolve_int8)
    quant_int8: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        quant = resolve_int8(self.quant_int8)
        w, bias = _QKVParams(3 * self.dim // self.tp_groups, self.qkv_bias, name="qkv")(c)
        if quant:
            # pass the f32 master kernel: the attention dispatch quantizes
            # it inside the fused-qkv projection (per-row x scales shared
            # by the q/k/v weight-column slices), so int8 composes with
            # the single-pad prep win (kernels/flash_attention.py)
            out = fused_qkv_attention(x, w, bias, self.num_heads, quant_int8=True)
        else:
            wd = w.astype(self.dtype)
            bd = bias.astype(self.dtype) if bias is not None else None
            out = fused_qkv_attention(x, wd, bd, self.num_heads)
        out = out.reshape(b, n, -1)
        # one param declaration for both modes (_QKVParams mirrors
        # nn.Dense's tree: "kernel" lecun_normal + "bias" zeros), so the
        # runtime quant flag can never fork the checkpoint format
        wp, bp = _QKVParams(self.dim, self.proj_bias, name="proj")(out.shape[-1])
        if quant:
            out = int8_dense(out, wp, bp, out_dtype=self.dtype)
        else:
            out = out.astype(self.dtype) @ wp.astype(self.dtype)
            if bp is not None:
                out = out + bp.astype(self.dtype)
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class _ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of [B, H, W, C] maps.

    Torch's channels-first LayerNorm (backbones/layers/utils.py:155-179);
    channels-last makes it the standard last-axis LayerNorm.
    """

    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        scale_init = nn.initializers.zeros if self.zero_init else nn.initializers.ones
        scale = self.param("weight", scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck over patch-token feature maps.

    Zero-initialised final norm => identity at init
    (backbones/layers/utils.py:90-152).
    """

    channels: int
    bottleneck: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, ph, pw, C]
        conv = lambda feats, ks, name: nn.Conv(
            feats, (ks, ks), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name=name,
        )
        y = conv(self.bottleneck, 1, "conv1")(x)
        y = _ChannelLayerNorm(self.bottleneck, name="norm1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = conv(self.bottleneck, 3, "conv2")(y)
        y = _ChannelLayerNorm(self.bottleneck, name="norm2")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = conv(self.channels, 1, "conv3")(y)
        y = _ChannelLayerNorm(self.channels, zero_init=True, name="norm3")(y)
        return y


class ViTBlock(nn.Module):
    """Pre-norm transformer block + optional residual conv branch."""

    dim: int
    num_heads: int
    patch_hw: tuple[int, int]
    use_residual_block: bool = False
    include_cls_token: bool = True
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    ffn_layer: str = "mlp"  # mlp | swiglu (vision_transformer.py:124-129)
    # tensor parallelism (parallel/tp.py): >1 makes this block the LOCAL
    # view — heads and MLP hidden width divided by tp_groups, partial
    # sums reduced over the 'model' mesh axis inside attn/mlp
    tp_groups: int = 1
    tp_axis: str = "model"
    quant_int8: bool = False
    fused_mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dash_phase2: bool = False):
        if self.num_heads % self.tp_groups or (4 * self.dim) % self.tp_groups:
            raise ValueError(
                f"tp_groups={self.tp_groups} must divide num_heads="
                f"{self.num_heads} and the MLP hidden width {4 * self.dim} "
                "— a floor-divided local view would silently drop width")
        tp_axis = self.tp_axis if self.tp_groups > 1 else None
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        x = x + LayerScale(self.dim, name="ls1")(
            SpatialAttention(
                self.dim, self.num_heads // self.tp_groups, dtype=self.dtype,
                tp_axis=tp_axis, tp_groups=self.tp_groups,
                quant_int8=self.quant_int8, name="attn",
            )(ln("norm1")(x))
        )
        if self.ffn_layer == "swiglu":
            if self.tp_groups > 1:
                raise NotImplementedError(
                    "tensor parallelism covers the default MLP FFN only "
                    "(no reference config uses swiglu; vision_transformer.py:124-129)")
            ffn = SwiGLUFFN(4 * self.dim, self.dim, dtype=self.dtype, name="mlp")
        else:
            ffn = Mlp(
                4 * self.dim // self.tp_groups, self.dim, self.lora_variant,
                self.lora_rank, self.lora_alpha, tp_axis=tp_axis,
                quant_int8=self.quant_int8, fused_mlp=self.fused_mlp,
                dtype=self.dtype, name="mlp",
            )
        x = x + LayerScale(self.dim, name="ls2")(ffn(ln("norm2")(x), dash_phase2))
        if self.use_residual_block:
            ph, pw = self.patch_hw
            ofs = 1 if self.include_cls_token else 0
            b, n, c = x.shape
            patches = x[:, ofs:, :].reshape(b, ph, pw, c)
            patches = patches + ResBottleneckBlock(c, c // 8, dtype=self.dtype, name="residual_")(patches)
            x = jnp.concatenate([x[:, :ofs, :], patches.reshape(b, n - ofs, c)], axis=1)
        return x


class DinoViT(nn.Module):
    """DINOv2 ViT trunk with intermediate-layer taps.

    ``__call__(images, take_indices)`` -> list of (patch_tokens, cls_token)
    per tap, post final-LayerNorm — the `get_intermediate_layers(...,
    return_class_token=True)` contract the DPT heads consume.
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    pos_grid: int = 37  # 518 / 14 — grid the pretrained pos-embed lives on
    residual_block_indexes: Sequence[int] = ()
    include_cls_token: bool = True
    lora_variant: str = "none"
    lora_rank: int = 4
    lora_alpha: float | None = None
    ffn_layer: str = "mlp"
    # tensor parallelism: >1 builds the LOCAL view of the trunk (heads and
    # MLP hidden split over the 'model' mesh axis; run under shard_map
    # with params sharded by parallel/tp.py)
    tp_groups: int = 1
    # scan-over-layers: run uniform block runs as one lax.scan over
    # stacked per-block params — the lowered HLO holds ONE block body per
    # segment instead of `depth` inlined copies (the vitl trunk lowering
    # exceeds remote-compile limits unrolled; PERFORMANCE.md "vitl").
    # Param tree, init, and checkpoints are IDENTICAL to the unrolled
    # form: the stacking happens at apply time from self.variables, so
    # gradients flow back to the per-layer params through the stack.
    scan_blocks: bool = False
    # serving-only int8 GEMMs for the block projections, threaded from
    # the model config (ENDODAV_INT8 env var is explicit override only)
    quant_int8: bool = False
    # serving-only fused MLP kernel (kernels/fused_mlp.py), threaded like
    # quant_int8 (ENDODAV_FUSED_MLP env var is explicit override only)
    fused_mlp: bool = False
    dtype: Any = jnp.float32

    def interpolated_pos_embed(self, pos_embed, ph: int, pw: int):
        """Bicubic pos-embed interpolation with the DINO 0.1 offset
        (vision_transformer.py:186-217)."""
        n = self.pos_grid * self.pos_grid
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:]
        if (ph, pw) == (self.pos_grid, self.pos_grid):
            return pos_embed if self.include_cls_token else patch_pe
        grid = patch_pe.reshape(1, self.pos_grid, self.pos_grid, self.embed_dim)
        sh = (ph + 0.1) / self.pos_grid
        sw = (pw + 0.1) / self.pos_grid
        grid = resize2d(grid.astype(jnp.float32), (ph, pw), "bicubic", align_corners=False, scale_hw=(sh, sw))
        flat = grid.reshape(1, ph * pw, self.embed_dim)
        if self.include_cls_token:
            return jnp.concatenate([cls_pe, flat], axis=1)
        return flat

    @nn.compact
    def __call__(self, images, take_indices: Sequence[int], dash_phase2: bool = False):
        b, h, w, _ = images.shape
        ph, pw = h // self.patch_size, w // self.patch_size
        n_pos = self.pos_grid * self.pos_grid + 1

        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype, name="patch_embed",
        )(images)
        x = x.reshape(b, ph * pw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.normal(1e-6), (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_pos, self.embed_dim), jnp.float32
        )
        # kept for checkpoint-shape parity with DINOv2 weights (unused here)
        self.param("mask_token", nn.initializers.zeros, (1, self.embed_dim), jnp.float32)

        if self.include_cls_token:
            x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.embed_dim)), x], axis=1)
        x = x + self.interpolated_pos_embed(pos_embed, ph, pw).astype(x.dtype)

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        take = set(int(i) for i in take_indices)
        if self.scan_blocks and not self.is_initializing():
            # apply-time scan over this module's own per-block params
            # (self.variables); init/checkpoints stay per-layer.
            taps = _run_block_plan(
                self, self.variables["params"], x, take_indices, (ph, pw),
                dash_phase2)
            outputs = [taps[i] for i in sorted(take)]
        else:
            outputs = []
            for i in range(self.depth):
                x = ViTBlock(
                    self.embed_dim, self.num_heads, (ph, pw),
                    use_residual_block=i in self.residual_block_indexes,
                    include_cls_token=self.include_cls_token,
                    lora_variant=self.lora_variant, lora_rank=self.lora_rank,
                    lora_alpha=self.lora_alpha, ffn_layer=self.ffn_layer,
                    tp_groups=self.tp_groups, quant_int8=self.quant_int8,
                    fused_mlp=self.fused_mlp,
                    dtype=self.dtype, name=f"blocks_{i}",
                )(x, dash_phase2)
                if i in take:
                    outputs.append(x)

        results = []
        for out in outputs:
            out = final_norm(out)
            if self.include_cls_token:
                results.append((out[:, 1:], out[:, 0]))
            else:
                # "not real cls tokens" (vision_transformer.py:323)
                results.append((out, out[:, 0]))
        return results


def _scan_segment_plan(depth: int, take_indices, residual_block_indexes):
    """Static execution plan for `scan_trunk_apply`.

    Returns a list of steps: ``("scan", (i, ...))`` — a uniform run of
    blocks executed as one `lax.scan` over stacked params; ``("solo", i)``
    — a block applied individually (ResBottleneck blocks carry extra
    params, so they can't share a scan body with plain blocks); and
    ``("tap", i)`` — snapshot the activations AFTER block i (the
    intermediate-layer tap the DPT head consumes).
    """
    take = set(int(i) for i in take_indices)
    residual = set(int(i) for i in residual_block_indexes)
    plan: list[tuple] = []
    run: list[int] = []

    def flush():
        if len(run) == 1:
            plan.append(("solo", run[0]))
        elif run:
            plan.append(("scan", tuple(run)))
        run.clear()

    for i in range(depth):
        if i in residual:
            flush()
            plan.append(("solo", i))
        else:
            run.append(i)
        if i in take:
            flush()
            plan.append(("tap", i))
    flush()
    return plan


def _run_block_plan(vit: DinoViT, params, x, take_indices, patch_hw,
                    dash_phase2: bool = False):
    """Execute the trunk's block stack per `_scan_segment_plan`: uniform
    runs as `lax.scan` over stacked per-block params, ResBottleneck
    blocks solo.  `params` is the DinoViT param tree (per-layer
    ``blocks_i`` subtrees); returns {tap_index: activations}.  Gradients
    w.r.t. the per-layer params flow through the `jnp.stack`."""

    def block(i: int) -> ViTBlock:
        return ViTBlock(
            vit.embed_dim, vit.num_heads, tuple(patch_hw),
            use_residual_block=i in set(vit.residual_block_indexes),
            include_cls_token=vit.include_cls_token,
            lora_variant=vit.lora_variant, lora_rank=vit.lora_rank,
            lora_alpha=vit.lora_alpha, ffn_layer=vit.ffn_layer,
            tp_groups=vit.tp_groups, quant_int8=vit.quant_int8,
            fused_mlp=vit.fused_mlp, dtype=vit.dtype,
        )

    plan = _scan_segment_plan(vit.depth, take_indices, vit.residual_block_indexes)
    taps: dict[int, jnp.ndarray] = {}
    for kind, v in plan:
        if kind == "tap":
            taps[v] = x
        elif kind == "solo":
            x = block(v).apply({"params": params[f"blocks_{v}"]}, x, dash_phase2)
        else:  # scan over a uniform run
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *(params[f"blocks_{i}"] for i in v))
            body_mod = block(v[0])

            def body(h_, p):
                return body_mod.apply({"params": p}, h_, dash_phase2), None

            x, _ = jax.lax.scan(body, x, stacked)
    return taps


def scan_trunk_apply(vit: DinoViT, params, images, take_indices: Sequence[int],
                     dash_phase2: bool = False):
    """`vit.apply({"params": params}, images, take_indices)` with uniform
    runs of transformer blocks executed as `lax.scan` over stacked
    per-block params.

    Why: the unrolled trunk lowers `depth` inlined copies of the block
    body — at vitl (24 blocks, LoRA'd MLPs, Pallas attention) the HLO
    exceeds this environment's remote-compile limits (>25 min, dropped
    connection; PERFORMANCE.md "vitl"). Scanning compiles ONE body per
    segment, shrinking the lowering by ~the trunk depth while computing
    the identical function (same per-block math; taps force segment
    boundaries so intermediates are exact).

    `vit` is an UNBOUND DinoViT (its dataclass config is read; no flax
    state is used), `params` is its param tree (`blocks_i` subtrees must
    be structurally identical within a scan segment, which holds for any
    fixed lora variant). Stacking happens inside this function, so the
    caller can jit it directly with the per-layer checkpoint tree.
    The same path is available as a module flag — `DinoViT(
    scan_blocks=True)` — which stacks from `self.variables` at apply
    time (whole-model jits and the train step ride it there).
    """
    b, h, w, _ = images.shape
    ph, pw = h // vit.patch_size, w // vit.patch_size

    x = nn.Conv(
        vit.embed_dim, (vit.patch_size, vit.patch_size),
        strides=(vit.patch_size, vit.patch_size), dtype=vit.dtype,
    ).apply({"params": params["patch_embed"]}, images)
    x = x.reshape(b, ph * pw, vit.embed_dim)
    if vit.include_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, vit.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + vit.interpolated_pos_embed(params["pos_embed"], ph, pw).astype(x.dtype)

    taps = _run_block_plan(vit, params, x, take_indices, (ph, pw), dash_phase2)

    norm = nn.LayerNorm(epsilon=1e-6, dtype=vit.dtype)
    results = []
    for i in take_indices:
        out = norm.apply({"params": params["norm"]}, taps[int(i)])
        if vit.include_cls_token:
            results.append((out[:, 1:], out[:, 0]))
        else:
            results.append((out, out[:, 0]))
    return results
