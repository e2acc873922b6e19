"""Hamlyn / C3VD dataset loader tests on synthetic trees."""

import os

import numpy as np
import pytest

RNG = np.random.default_rng(6)


@pytest.fixture(scope="module")
def hamlyn_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("hamlyn")
    for seq in ("rectified05", "rectified14"):
        img_dir = root / seq / "image01"
        dep_dir = root / seq / "depth01"
        os.makedirs(img_dir)
        os.makedirs(dep_dir)
        for i in range(4):
            cv2.imwrite(str(img_dir / f"{i:07d}.jpg"),
                        RNG.integers(0, 255, (288, 720, 3), dtype=np.uint8))
            cv2.imwrite(str(dep_dir / f"{i:07d}.png"),
                        RNG.integers(20, 150, (288, 720), dtype=np.uint16))
    return str(root)


def test_hamlyn_videos(hamlyn_tree):
    from endodav_tpu.data import HamlynVideos

    ds = HamlynVideos(hamlyn_tree, ["rectified05"], max_length=3)
    seq = ds[0]
    assert seq["colors"].shape == (3, 288, 720, 3)
    assert seq["depths"].shape == (3, 288, 720)


def test_hamlyn_frames_crop_rule(hamlyn_tree):
    from endodav_tpu.data import HamlynFrames

    ds = HamlynFrames(hamlyn_tree, height=64, width=80)
    assert len(ds) == 8
    # sequences > 13 use the (180, 0, 590, 288) crop on image AND depth width
    cropped = [ds[i] for i in range(len(ds)) if ds.scans[i]["sequence"] == 14]
    uncropped = [ds[i] for i in range(len(ds)) if ds.scans[i]["sequence"] == 5]
    assert cropped and uncropped
    assert cropped[0]["depth_gt"].shape == (288, 410, 1)
    assert uncropped[0]["depth_gt"].shape == (288, 720, 1)
    assert cropped[0][("color", 0, 0)].shape == (64, 80, 3)


def test_c3vd_frames(tmp_path):
    import cv2

    from endodav_tpu.data import C3VDFrames

    vdir = tmp_path / "cecum_t1"
    os.makedirs(vdir)
    for i in range(3):
        cv2.imwrite(str(vdir / f"{i:04d}_color.png"),
                    RNG.integers(0, 255, (1080, 1350, 3), dtype=np.uint8))
        d = RNG.uniform(1000, 60000, (1080, 1350)).astype(np.float32)
        cv2.imwrite(str(vdir / f"{i:04d}_depth.tiff"), np.stack([d] * 3, -1))
    ds = C3VDFrames(str(tmp_path), height=64, width=80)
    assert len(ds) == 3
    item = ds[0]
    # crop box (200, 180, 1150, 900) -> 720x950; depth rescaled by 100/65535
    assert item["depth_gt"].shape == (720, 950, 1)
    assert item["depth_gt"].max() <= 100.0 / 65535.0 * 65535.0 + 1e-3
    assert item["depth_gt"].max() < 100.0
    assert item[("color", 0, 0)].shape == (64, 80, 3)
