"""ScaredFrames (endovis split) path-scheme and AFSfM model tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endodav_tpu.data import ScaredFrames

RNG = np.random.default_rng(4)


@pytest.fixture(scope="module")
def endovis_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("endovis")
    folder = "dataset7/keyframe4"  # dataset 7 < 8 -> train/ prefix
    base = root / "train" / folder / "data"
    for sub in ("left", "right", "scene_points", "frame_data"):
        os.makedirs(base / sub, exist_ok=True)
    for i in range(6):
        img = RNG.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(base / "left" / f"{i:010d}.png"), img)
        cv2.imwrite(str(base / "right" / f"{i:010d}.png"), img)
        depth = RNG.uniform(20, 120, (64, 80)).astype(np.float32)
        cv2.imwrite(str(base / "scene_points" / f"scene_points{i:06d}.tiff"),
                    np.stack([depth] * 3, axis=-1))
        pose = np.eye(4)
        with open(base / "frame_data" / f"frame_data{i:06d}.json", "w") as f:
            json.dump({"camera-pose": pose.tolist()}, f)
    return str(root), folder


def test_scared_frames_line_format(endovis_tree):
    root, folder = endovis_tree
    lines = [f"{folder}\t2\tl", f"{folder}\t3\tl"]  # tab-separated like the split files
    ds = ScaredFrames(root, lines, height=32, width=40, frame_idxs=(0, -1, 1))
    item = ds[0]
    assert item[("color", 0, 0)].shape == (32, 40, 3)
    assert item[("color", -1, 0)].shape == (32, 40, 3)
    assert item["depth_gt"].shape == (64, 80, 1)
    assert item[("K", 0)].shape == (4, 4)


def test_scared_frames_pose_accessor(endovis_tree):
    root, folder = endovis_tree
    ds = ScaredFrames(root, [f"{folder} 2 l"], height=32, width=40)
    pose = ds.get_pose(folder, 2)
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-6)


def test_afsfm_forward():
    from endodav_tpu.models import AFSfMDepth

    m = AFSfMDepth(num_layers=18)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out[("disp", 0)].shape == (1, 64, 64, 1)
    assert out[("disp", 3)].shape == (1, 8, 8, 1)
    v = np.asarray(out[("disp", 0)])
    assert (v > 0).all() and (v < 1).all()
