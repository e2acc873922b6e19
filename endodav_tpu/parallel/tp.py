"""Tensor parallelism for the ViT trunk — latency scaling over ICI.

Data parallelism (the `data` mesh axis, `parallel/__init__.py`) scales
*throughput*: independent 32-frame windows per chip.  It cannot shrink
the latency of one window, which is what bounds the live
`eval/streaming.DepthStreamer` path and the vitl configuration (52.6
fps/chip at 518 px — PERFORMANCE.md).  This module adds the classic
Megatron-style column/row split of the trunk's four projections over a
`model` mesh axis:

  qkv  [C, 3C]  -> column-sharded by head group (after a one-time column
                   permutation so each device's contiguous slice is its
                   own packed [q|k|v] panel — see `tp_prepare_params`)
  proj [C, C]   -> row-sharded (rows are (H, Dh)-ordered, so the
                   contiguous split IS the head-group split); partial
                   sums reduced with one psum
  fc1  [C, 4C]  -> column-sharded
  fc2  [4C, C]  -> row-sharded; psum

Per block: 2 psums of [B, N, C] over ICI; everything else (patch embed,
LayerNorms, LayerScale, ResBottleneck, the DPT/temporal decoder) is
replicated compute on replicated activations.  The local model view is
the SAME flax modules with ``tp_groups=g`` (models/vit.py divides heads
and MLP hidden width and inserts the psums), run under `shard_map` so
the Pallas flash/fused-temporal kernels see ordinary local arrays —
automatic GSPMD partitioning cannot split a `pallas_call`, which is why
this is a shard_map design (How-to-Scale-Your-Model recipe: pick the
mesh, place the collectives where the math says they go).

Scope: merged-LoRA serving graphs (``lora_type='none'``) — the adapter
delta of an unmerged graph spans the sharded width and is not worth
splitting when `merge_lora_params` already folds it exactly.

The biases of the two row-sharded projections are pre-divided by g so
the per-device bias-add survives the psum exactly (g * b/g == b).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from endodav_tpu.eval.video_inference import split_compiled_forward
from endodav_tpu.utils.envflags import env_auto, env_on

__all__ = ["build_tp_mesh", "tp_prepare_params", "tp_param_specs",
           "tp_window_forward", "tp_dedup_window_forward"]


def build_tp_mesh(n: int, devices=None, data: int = 1) -> Mesh:
    """1D ('model',) mesh, or — with data > 1 — a 2D ('data', 'model')
    mesh for throughput x latency scaling of the dedup encode."""
    if n < 1:
        raise ValueError(f"tensor-parallel mesh needs 'model=N' with N >= 1, got {n}")
    devs = list(devices if devices is not None else jax.devices())
    if n * data > len(devs):
        raise ValueError(f"tensor-parallel mesh wants {n * data} devices, "
                         f"only {len(devs)} visible")
    if data > 1:
        return Mesh(np.array(devs[:n * data]).reshape(data, n), ("data", "model"))
    return Mesh(np.array(devs[:n]), ("model",))


def _is_trunk_proj(path):
    """(is_qkv, is_proj, is_fc1, is_fc2) for a param path inside the
    EndoDAV tree ('pretrained'/'blocks_i'/('attn'|'mlp')/name/leaf)."""
    keys = [getattr(p, "key", None) for p in path]
    if "pretrained" not in keys:
        return (False,) * 4
    return ("qkv" in keys, "proj" in keys and "attn" in keys,
            "fc1" in keys, "fc2" in keys)


def tp_prepare_params(params, g: int, num_heads: int):
    """Transform the GLOBAL param tree for a g-way trunk split.

    * qkv kernel/bias columns permuted (3, H, Dh) -> (g, 3, H/g, Dh) so a
      contiguous g-split yields each device's packed local [q|k|v] panel;
    * proj/fc2 biases divided by g (the psum restores them exactly);
    * everything else untouched.
    Returns a NEW tree (no aliasing of transformed leaves).
    """
    if num_heads % g:
        raise ValueError(f"num_heads={num_heads} not divisible by tp={g}")

    def fix(path, leaf):
        is_qkv, is_proj, is_fc1, is_fc2 = _is_trunk_proj(path)
        name = getattr(path[-1], "key", None)
        if is_qkv:
            c3 = leaf.shape[-1]
            c = c3 // 3
            dh = c // num_heads
            parts = leaf.reshape(*leaf.shape[:-1], 3, g, num_heads // g, dh)
            parts = jnp.swapaxes(parts, -4, -3)  # (g, 3, H/g, Dh)
            return parts.reshape(*leaf.shape[:-1], c3)
        if (is_proj or is_fc2) and name == "bias":
            return leaf / g
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


def tp_param_specs(params):
    """PartitionSpec tree for `tp_prepare_params` output: qkv/fc1
    column-sharded, proj/fc2 kernels row-sharded, the rest replicated."""

    def spec(path, leaf):
        is_qkv, is_proj, is_fc1, is_fc2 = _is_trunk_proj(path)
        name = getattr(path[-1], "key", None)
        if name == "kernel":
            if is_qkv or is_fc1:
                return P(None, "model")
            if is_proj or is_fc2:
                return P("model", None)
        if name == "bias" and (is_qkv or is_fc1):
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_window_forward(model_local, variables, mesh: Mesh, num_heads: int):
    """Jitted TP forward: window chunks [C, T, h, w, 3] -> [C*T, h', w', 1]
    for EndoDAV, frame batches [B, h, w, 3] -> [B, h', w', 1] for EndoDAC
    (both expose the same 'pretrained' trunk subtree and disp-dict output).

    ``model_local`` must be built with ``tp_groups=mesh.shape['model']``
    and ``lora_type='none'`` (merged serving graph).  Params are
    transformed, placed sharded on the mesh (non-param collections such
    as batch_stats travel replicated), and the forward runs under
    shard_map so Pallas kernels trace at local shapes.

    ENDODAV_SPLIT_COMPILE=1 composes a shard_map'd trunk jit with
    per-T shard_map'd head jits (EndoDAV.encode/decode) — the same
    strategy `engine.depth_window_forward` uses single-device, needed
    because the whole-model vitl lowering exceeds this environment's
    remote-compile limits (PERFORMANCE.md).
    """
    import os

    g = mesh.shape["model"]
    if getattr(model_local, "lora_type", "none") != "none":
        raise ValueError("tensor parallelism expects the merged serving "
                         "graph (lora_type='none'); fold adapters with "
                         "merge_lora_params first")
    extras = {k: v for k, v in variables.items() if k != "params"}
    params = tp_prepare_params(variables["params"], g, num_heads)
    specs = {"params": tp_param_specs(params),
             **{k: jax.tree.map(lambda _: P(), v) for k, v in extras.items()}}
    sharded = jax.device_put(
        {"params": params, **extras},
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)))

    # split compilation needs the model's encode/decode methods (EndoDAV);
    # single-frame EndoDAC compiles whole-model regardless of the flag
    # NOTE: `sharded`/`head_sharded` are passed to the jits as ARGUMENTS
    # (jit respects the arrays' NamedShardings) — a closed-over array
    # lowers as an inline HLO constant, embedding the full weight set in
    # every compiled module (eval/engine.py note; PERFORMANCE.md "Params
    # as jit ARGUMENTS").
    # split compile AUTO-ON at vitl (engine.py "vitl AUTO-DEFAULT")
    if (not env_auto("ENDODAV_SPLIT_COMPILE",
                     getattr(model_local, "encoder", None) == "vitl")
            or not hasattr(model_local, "encode")):
        @jax.jit
        def fwd_c(v, win):
            run = jax.shard_map(
                lambda vv, w: model_local.apply(vv, w)[("disp", 0)],
                mesh=mesh, in_specs=(specs, P()), out_specs=P(),
                check_vma=False)
            return run(v, win)

        def fwd(win):
            return fwd_c(sharded, win)

        # AOT handle with the sharded params bound (introspection/tests)
        fwd.lower = lambda win: fwd_c.lower(sharded, win)
        return fwd

    # split compilation: trunk and head as separate shard_maps (the head's
    # params are replicated; it still runs under shard_map so its Pallas
    # temporal kernels trace at ordinary local shapes)
    @jax.jit
    def trunk_c(v, win):
        run = jax.shard_map(
            lambda vv, w: model_local.apply(vv, w, method="encode"),
            mesh=mesh, in_specs=(specs, P()), out_specs=P(),
            check_vma=False)
        return run(v, win)

    def trunk(win):
        return trunk_c(sharded, win)

    head_vars = {"params": {"head": variables["params"]["head"]}, **extras}
    head_specs = jax.tree.map(lambda _: P(), head_vars)
    head_sharded = jax.device_put(
        head_vars, jax.tree.map(lambda s: NamedSharding(mesh, s), head_specs,
                                is_leaf=lambda x: isinstance(x, P)))

    def make_head(t):
        def head_fn(v, taps, frames=t):
            return model_local.apply(v, taps, frames,
                                     method="decode")[("disp", 0)]

        head_c = jax.jit(lambda v, taps: jax.shard_map(
            head_fn, mesh=mesh, in_specs=(head_specs, P()),
            out_specs=P(), check_vma=False)(v, taps))
        return lambda taps: head_c(head_sharded, taps)

    return split_compiled_forward(trunk, make_head)


class TPDedupWindowForward:
    """Unique-frame dedup pipeline with a TENSOR-PARALLEL encode.

    Implements the `eval/video_inference.DedupWindowForward` contract
    (``.variables`` / ``.batch_frames`` / ``encode(v, batch)`` /
    ``head_for(fh, fw, dtype)``) so it drops into `infer_video_depth`
    and `eval/streaming.DepthStreamer` unchanged — the composition the
    model axis exists for: dedup removes the sliding window's re-encode
    work, TP then splits each encode batch's trunk over the mesh's
    'model' axis, multiplying the per-window critical-path cut on the
    latency-bound configs (vitl / 518 px streaming, PERFORMANCE.md).

    On a 2D ('data', 'model') mesh the encode batch additionally shards
    over 'data' (falls back to replicated-batch compute for batches the
    data axis does not divide, e.g. the streamer's per-frame [1]-batch
    encodes).  The temporal DPT head runs as replicated compute under
    shard_map (its Pallas kernels need ordinary local shapes); encode
    dominates at the dedup-default resolutions, so that is where the
    chips go — full head DP remains the window-forward path
    (`tp_window_forward` / --serve_mesh data=N).

    Weights: `encode`/`head_for` accept the RAW variables tree for
    interface parity; the first call (and any call with a new tree
    object) transforms + places it via `update_weights`, cached by id.
    """

    def __init__(self, model_local, variables, mesh: Mesh, num_heads: int,
                 batch_frames: int | None = None):
        from endodav_tpu.eval.video_inference import INFER_LEN
        from endodav_tpu.models.endodav import ENDODAV_CONFIGS

        if getattr(model_local, "lora_type", "none") != "none":
            raise ValueError("TP dedup expects the merged serving graph "
                             "(lora_type='none'); fold adapters with "
                             "merge_lora_params first")
        if variables is None:
            raise ValueError("TPDedupWindowForward needs the variables at "
                             "construction (they are transformed + sharded)")
        self._mesh = mesh
        self._g = mesh.shape["model"]
        self._data = mesh.shape.get("data", 1)
        self._num_heads = num_heads
        self._model = model_local
        self._infer_len = INFER_LEN
        self.batch_frames = int(batch_frames or INFER_LEN)
        take = ENDODAV_CONFIGS[model_local.encoder]["intermediate"]
        self._take = take
        self._head_cache: dict = {}
        self._encode_jits: dict = {}
        self._known: tuple = ()
        self.update_weights(variables)

    # -------------------------------------------------- weight placement

    def update_weights(self, variables):
        """Transform + shard a raw variables tree (Megatron split for the
        trunk, replicated head/extras); id-cached so per-call translation
        is free for the steady-state same-weights case."""
        extras = {k: v for k, v in variables.items() if k != "params"}
        params = tp_prepare_params(variables["params"], self._g, self._num_heads)
        self._specs = {"params": tp_param_specs(params),
                       **{k: jax.tree.map(lambda _: P(), v)
                          for k, v in extras.items()}}
        put = lambda tree, specs: jax.device_put(
            tree, jax.tree.map(lambda s: NamedSharding(self._mesh, s), specs,
                               is_leaf=lambda x: isinstance(x, P)))
        self.variables = put({"params": params, **extras}, self._specs)
        hv = {"params": {"head": variables["params"]["head"]}, **extras}
        self._head_specs = jax.tree.map(lambda _: P(), hv)
        self._head_vars = put(hv, self._head_specs)
        # STRONG references, compared by identity in _sync.  Keying on
        # bare id()s is the recycling hazard the comment at the bottom of
        # eval/video_inference.py documents: once the caller's raw tree
        # is garbage-collected, a newly built weights dict can land on
        # the recycled id and _sync would silently skip update_weights,
        # serving stale sharded weights (round-4 advisor).  Holding the
        # objects makes an id collision impossible; the cost is one extra
        # reference to arrays the caller holds anyway.
        self._known = (variables, self.variables)

    def _sync(self, v):
        if v is not None and not any(v is k for k in self._known):
            self.update_weights(v)

    # ------------------------------------------------------------ encode

    def _enc_local(self):
        from endodav_tpu.utils.envflags import env_auto

        model, take = self._model, self._take
        if env_auto("ENDODAV_SCAN_TRUNK", model.encoder == "vitl"):
            from endodav_tpu.models.endodav import build_trunk
            from endodav_tpu.models.vit import scan_trunk_apply

            vit = build_trunk(model)

            def enc(vv, batch):
                x = model.preprocess(batch[None])
                taps = scan_trunk_apply(vit, vv["params"]["pretrained"], x, take)
                maps = model.apply(vv, taps, method="decode_prefix")
                return tuple(m.reshape(m.shape[0], -1) for m in maps)
        else:

            def enc(vv, batch):
                taps = model.apply(vv, batch[None], method="encode")
                maps = model.apply(vv, taps, method="decode_prefix")
                # FLATTENED boundary (video_inference.prefix_map_shapes)
                return tuple(m.reshape(m.shape[0], -1) for m in maps)
        return enc

    def encode(self, v, batch):
        self._sync(v)
        # data-shard the batch when the axis divides it; replicate otherwise
        # (each jit is cached; batch shapes are static per pipeline)
        data_ok = self._data > 1 and batch.shape[0] % self._data == 0
        key = bool(data_ok)
        enc_c = self._encode_jits.get(key)
        if enc_c is None:
            mesh, specs = self._mesh, self._specs
            bspec = P("data") if data_ok else P()
            enc_local = self._enc_local()

            @jax.jit
            def enc_c(vv, b):
                # output: the 4-tuple of per-frame DPT prefix maps
                # (decode_prefix), each data-sharded like the batch
                run = jax.shard_map(enc_local, mesh=mesh,
                                    in_specs=(specs, bspec),
                                    out_specs=(bspec,) * 4, check_vma=False)
                return run(vv, b)

            self._encode_jits[key] = enc_c
        return enc_c(self.variables, batch)

    # -------------------------------------------------------------- head

    def head_for(self, fh: int, fw: int, out_dtype):
        key = (fh, fw, np.dtype(out_dtype).name)
        cached = self._head_cache.get(key)
        if cached is None:
            from endodav_tpu.ops.resize import resize2d

            model, il = self._model, self._infer_len
            mesh, hspecs = self._mesh, self._head_specs

            from endodav_tpu.models.endodav import prefix_map_shapes

            shapes = prefix_map_shapes(model)

            def head_local(vv, widx, *maps):
                gathered = tuple(
                    jnp.take(m, widx, axis=0).reshape(-1, *shp)
                    for m, shp in zip(maps, shapes))
                disp = model.apply(vv, gathered, il,
                                   method="decode_suffix")[("disp", 0)]
                disp = resize2d(disp, (fh, fw), "bilinear", align_corners=True)
                return disp[..., 0].astype(out_dtype)

            head_c = jax.jit(lambda vv, widx, *maps: jax.shard_map(
                head_local, mesh=mesh,
                in_specs=(hspecs, P()) + (P(),) * len(maps),
                out_specs=P(), check_vma=False)(vv, widx, *maps))

            def cached(v, widx, *maps):
                self._sync(v)
                return head_c(self._head_vars, widx, *maps)

            self._head_cache[key] = cached
        return cached


def tp_dedup_window_forward(model_local, variables, mesh: Mesh,
                            num_heads: int, batch_frames: int | None = None):
    """Build the TP dedup pipeline (class above)."""
    return TPDedupWindowForward(model_local, variables, mesh, num_heads,
                                batch_frames)
