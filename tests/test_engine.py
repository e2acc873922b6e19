"""Eval-engine plumbing tests with stub predictors (no model compile)."""

import numpy as np
import pytest

from endodav_tpu.eval import engine

RNG = np.random.default_rng(5)


class EvalOpts:
    model_type = "endodav"
    depth_align = "scale_shift"
    min_depth = 0.1
    max_depth = 150.0
    pred_depth_scale_factor = 1.0
    chunk_windows = 1
    disp2depth = False
    visualize_depth = False
    depth_image_shape = (28, 42)
    fast_stitch = False


def _sequences(n_seq=2, n=6, h=24, w=30, with_pose=True):
    out = []
    for s in range(n_seq):
        depths = RNG.uniform(30, 120, (n, h, w)).astype(np.float32)
        seq = {
            "colors": RNG.integers(0, 255, (n, h, w, 3), dtype=np.uint8),
            "depths": depths,
            "filename": f"seq{s}",
        }
        if with_pose:
            K = np.eye(4)
            K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.8 * w, 1.0 * h, w / 2, h / 2
            poses = []
            for i in range(n):
                p = np.eye(4)
                p[:3, 3] = [0.01 * i, 0, 0]
                poses.append(p)
            seq["poses"] = np.stack(poses)
            seq["Ks"] = np.repeat(K[None], n, axis=0)
        out.append(seq)
    return out


def test_evaluate_video_sequences_with_stub_predictor():
    opt = EvalOpts()
    seqs = _sequences()

    def pred_fn(colors):
        # varying sigmoid-domain disparity (a constant field would make the
        # MAD alignment degenerate, as it would for the reference too)
        return (0.02 + 0.08 * colors.mean(-1).astype(np.float32) / 255.0)

    res = engine.evaluate_video_sequences(opt, seqs, pred_depths_fn=pred_fn)
    assert res["mean_errors"].shape == (7,)
    assert np.isfinite(res["mean_errors"]).all()
    assert res["mean_temporal"] is not None and len(res["mean_temporal"]) == 2
    assert len(res["per_sequence"]) == 2
    assert res["mean_infer_ms"] is not None


def test_evaluate_video_sequences_re_eval_mode():
    opt = EvalOpts()
    seqs = []
    for s in _sequences(with_pose=False):
        seqs.append({
            "depths": s["depths"],
            "pred_depths": s["depths"] * 0.5 + RNG.normal(0, 0.5, s["depths"].shape).astype(np.float32),
            "filename": s["filename"],
        })
    res = engine.evaluate_video_sequences(opt, seqs, with_temporal=False)
    assert np.isfinite(res["mean_errors"]).all()
    # scale_shift alignment should make abs_rel small for an affine-related pred
    assert res["mean_errors"][0] < 0.1


def test_confidence_interval():
    ci = engine.confidence_interval_95([1.0, 1.1, 0.9, 1.05, 0.95])
    assert ci[0] < 1.0 < ci[1]
    assert np.isnan(engine.confidence_interval_95([1.0])).all()


def test_print_alignment_summary(capsys):
    # scale mode: median/std ratio line (evaluate_depth_video_pose.py:322-327)
    engine.print_alignment_summary("scale", [1.0, 2.0, 4.0])
    out = capsys.readouterr().out
    assert "Scaling ratios | med: 2.000" in out
    # scale_shift mode: 4-stat mean line (evaluate_depth_video_pose.py:328-333)
    engine.print_alignment_summary("scale_shift", [], [(1, 2, 3, 4), (3, 4, 5, 6)])
    out = capsys.readouterr().out
    assert "t_gt: 2.000 | s_gt: 3.000 | t_pred: 4.000 | s_pred: 5.000" in out
    # nothing collected: no line at all (matches the reference's guards)
    engine.print_alignment_summary("scale", [])
    engine.print_alignment_summary("scale_shift", [], [])
    assert capsys.readouterr().out == ""


def test_print_ci_row(capsys):
    errs = np.tile(np.array([[1.0, 2.0]]), (8, 1))
    errs += RNG.normal(0, 0.01, errs.shape)
    temps = np.tile(np.array([[5.0]]), (8, 1)) + RNG.normal(0, 0.01, (8, 1))
    engine.print_ci_row(errs, temps)
    out = capsys.readouterr().out
    assert out.startswith("cls: ") and out.count("[") == 3
    # column order: depth metrics first, then temporal
    import re
    los = [float(m) for m in re.findall(r"\[([-0-9.]+),", out)]
    assert los[0] < 1.1 < los[1] and 4.5 < los[2]
    # empty arrays must not crash (every-mask-empty runs)
    engine.print_ci_row(np.zeros((0, 2)))
    assert "no valid frames" in capsys.readouterr().out


@pytest.mark.slow
def test_merge_lora_galora_notice(capsys):
    """--merge_lora with galora must print the runtime notice and serve the
    UNMERGED graph (the input-gated delta cannot fold; engine.py)."""
    import copy

    from flax.traverse_util import flatten_dict

    from endodav_tpu.eval.engine import build_depth_model
    from test_train_step import Opts

    opt = copy.copy(Opts())
    opt.model_type = "endodac"
    opt.lora_type = "galora"
    opt.merge_lora = True
    opt.depth_image_shape = (28, 28)
    model, variables = build_depth_model(opt)
    out = capsys.readouterr().out
    assert "--merge_lora ignored" in out
    keys = ["/".join(k) for k in flatten_dict(variables["params"])]
    assert any("extra" in k or "lora" in k for k in keys)


@pytest.mark.slow
def test_evaluate_depth_post_process(tmp_path):
    """--post_process must reproduce the reference's exact semantics —
    a second flipped forward whose result is DISCARDED (the reference's
    batch_post_process_disparity is dead code, evaluate_depth.py:35-47
    vs :152-166) so metrics are identical; --post_process_blend
    (extension) applies the real Monodepth-v1 blend."""
    import copy
    import os

    import cv2

    from endodav_tpu.cli import evaluate_depth as ed
    from test_train_step import Opts

    root = tmp_path / "hamlyn"
    img_dir = root / "rectified05" / "image01"
    dep_dir = root / "rectified05" / "depth01"
    os.makedirs(img_dir)
    os.makedirs(dep_dir)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"{i:07d}.jpg"),
                    RNG.integers(0, 255, (96, 120, 3), dtype=np.uint8))
        cv2.imwrite(str(dep_dir / f"{i:07d}.png"),
                    RNG.integers(20, 150, (96, 120), dtype=np.uint16))

    opt = copy.copy(Opts())
    opt.model_type = "endodac"
    opt.lora_type = "lora"
    opt.merge_lora = False
    opt.depth_image_shape = (28, 28)
    opt.eval_split = "hamlyn"
    opt.data_path = str(root)
    opt.height, opt.width = 64, 80
    opt.ext_disp_to_eval = None
    opt.post_process = False
    opt.post_process_blend = False
    opt.disable_median_scaling = False
    opt.save_pred_disps = False
    opt.load_weights_folder = None

    base = ed.evaluate(opt)
    pp_opt = copy.copy(opt)
    pp_opt.post_process = True
    pp = ed.evaluate(pp_opt)
    np.testing.assert_allclose(pp, base, rtol=1e-6)

    blend_opt = copy.copy(opt)
    blend_opt.post_process_blend = True
    blend = ed.evaluate(blend_opt)
    assert np.isfinite(blend).all()
