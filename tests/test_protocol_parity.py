"""Eval-DRIVER protocol parity vs the reference's actual eval scripts.

Complements test_fullmodel_parity (model graphs) by executing the
reference's `evaluate_depth_video.py` END TO END — its SCAREDVideos
loader, infer_video_depth loop, disp_to_depth, align_shift_and_scale,
compute_errors, TAE/TAS and scipy CI — via tools/parity_released.py,
and asserting every printed metric matches our CLI on the same
randomized weights + synthetic tree (round-2 VERDICT items 2 & 5).
A masking/alignment drift anywhere in our metric stack fails this test.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def synth_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scared_proto"))
    h, w, n = 64, 80, 24  # 24 frames -> 2 sliding windows per sequence
    rng = np.random.default_rng(5)
    seqs = ["train/dataset5/keyframe1", "train/dataset3/keyframe3",
            "train/dataset4/keyframe3"]  # the fixed val_files.txt split
    for seq in seqs:
        base = os.path.join(root, seq, "data")
        for sub in ("left", "right", "scene_points", "frame_data"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(base, "left", f"{i:010d}.png"), img)
            # the video train dataset asserts equal left/right/depth/pose
            # counts (scared_video_dataset.py:330-337)
            cv2.imwrite(os.path.join(base, "right", f"{i:010d}.png"), img)
            depth = rng.uniform(20, 120, (h, w)).astype(np.float32)
            scene = np.stack([depth, depth * 0.25 + 7.0, -0.5 * depth + 3.0], -1)
            cv2.imwrite(os.path.join(base, "scene_points",
                                     f"scene_points{i:06d}.tiff"), scene)
            pose = np.eye(4)
            pose[:3, 3] = rng.standard_normal(3) * 0.05
            with open(os.path.join(base, "frame_data",
                                   f"frame_data{i:06d}.json"), "w") as f:
                json.dump({"camera-pose": pose.tolist()}, f)
    return root


@pytest.mark.slow
def test_video_eval_driver_protocol_parity(synth_tree):
    from tools import parity_released

    rc = parity_released.main([
        "--data_path", synth_tree, "--random_weights",
        "--disable_residual_block", "--disable_conv_head",
        "--lora_type", "lora", "--int8_gate",
    ])
    assert rc == 0, ("protocol metrics diverged from the reference driver "
                     "(or the int8 serving leg regressed AbsRel/delta1 "
                     "beyond 0.5% relative vs bf16)")


@pytest.mark.slow
def test_pose_eval_driver_protocol_parity(synth_tree):
    """Reference evaluate_pose.py + export_gt_pose.py vs our CLIs on the
    same randomized pose stack: gt npz exact, ATE/RE/CI + intrinsics
    stats to print tolerance.  (The reference driver crashes as shipped —
    mono_dataset.py:206-209 '# edit' unsqueeze vs torch.cat(dim=1) — and
    runs under the wrapper's opt-in FIX_UNSQUEEZE reversal.)"""
    from tools import parity_pose

    rc = parity_pose.main(["--data_path", synth_tree])
    assert rc == 0, "pose protocol diverged from the reference driver"


@pytest.mark.slow
def test_depth_eval_driver_protocol_parity(synth_tree):
    """Reference evaluate_depth.py --ext_disp_to_eval + export_gt_depth.py
    vs our CLIs on the same random disparity stack: gt npz exact,
    ratio med/std + 7 metrics + per-metric CI to print tolerance."""
    from tools import parity_depth

    rc = parity_depth.main(["--data_path", synth_tree])
    assert rc == 0, "depth-driver protocol diverged from the reference"


@pytest.mark.slow
@pytest.mark.parametrize("align", ["scale_shift", "scale"])
def test_hamlyn_video_driver_protocol_parity(align):
    """Reference evaluate_depth_video_hamlyn.py --pred_root vs our CLI on
    the same synthetic tree + random depth npys: alignment stats, 7
    metrics, per-metric CI (the tool generates its own tree)."""
    from tools import parity_hamlyn

    rc = parity_hamlyn.main(["--depth_align", align])
    assert rc == 0, f"hamlyn protocol ({align}) diverged from the reference"


@pytest.mark.slow
def test_pose_video_driver_protocol_parity(synth_tree):
    """Reference evaluate_depth_video_pose.py vs our CLI on the same
    randomized endodav + pose stack: alignment stats, 9 metrics + CIs,
    per-sequence ATE/RE/CI + intrinsics stats.  (The reference driver
    needs --visualize_depth to define its own eval_dir and the
    imageio-ffmpeg plugin is absent — wrapper ENDODAV_REF_STUB_VIS
    drops the mp4/plot writers only.)"""
    from tools import parity_pose_video

    rc = parity_pose_video.main(["--data_path", synth_tree])
    assert rc == 0, "combined driver protocol diverged from the reference"


@pytest.mark.slow
@pytest.mark.parametrize("temporal", [False, True])
def test_train_step_loss_protocol_parity(synth_tree, temporal):
    """One run_epoch iteration of the reference's actual trainer
    (randomized weights, real dataset batch, phase-0 Adam step, main
    forward) vs our jitted two-phase step on the identical batch +
    converted weights: loss_0, the main loss and every per-scale
    component agree to float tolerance (trainer:395-431,913-971)."""
    from tools import parity_trainstep

    argv = ["--data_path", synth_tree]
    if temporal:
        argv.append("--temporal")
    rc = parity_trainstep.main(argv)
    assert rc == 0, "train-step loss protocol diverged from the reference"
