"""Data layer tests on a synthetic SCARED-like tree."""

import json
import os

import numpy as np
import pytest

from endodav_tpu.data import Loader, ScaredVideoClips, ScaredVideos
from endodav_tpu.data.pipeline import apply_color_jitter, sample_color_jitter, scaled_intrinsics

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def scared_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("scared")
    filenames = ["train/dataset1/keyframe1", "train/dataset1/keyframe2"]
    n_frames = 24
    h, w = 64, 80
    for fn in filenames:
        base = root / fn / "data"
        for sub in ("left", "right", "scene_points", "frame_data"):
            os.makedirs(base / sub, exist_ok=True)
        for i in range(n_frames):
            img = RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(base / "left" / f"{i:06d}.png"), img)
            cv2.imwrite(str(base / "right" / f"{i:06d}.png"), img)
            depth = RNG.uniform(20, 120, (h, w)).astype(np.float32)
            # Three DISTINCT channels (like real scene_points x,y,z) so the
            # native-decode parity test catches channel-selection bugs: the
            # depth the readers must return is cv2 channel 0 of the BGR read.
            scene = np.stack([depth, depth * 0.25 + 7.0, depth * -0.5 + 3.0],
                             axis=-1)
            cv2.imwrite(
                str(base / "scene_points" / f"scene_points{i:06d}.tiff"),
                scene,
            )
            pose = np.eye(4)
            pose[:3, 3] = RNG.standard_normal(3) * 0.1
            with open(base / "frame_data" / f"frame_data{i:06d}.json", "w") as f:
                json.dump({"camera-pose": pose.tolist()}, f)
    return str(root), filenames, (h, w, n_frames)


def test_video_clips_shapes(scared_tree):
    root, filenames, (h, w, n) = scared_tree
    ds = ScaredVideoClips(root, filenames, height=32, width=40, is_train=True, T=4)
    assert len(ds) > 0
    item = ds[0]
    for fi in (0, -1, 1):
        for s in range(4):
            assert item[("color", fi, s)].shape == (4, 32 // 2 ** s, 40 // 2 ** s, 3)
            assert item[("color_aug", fi, s)].shape == (4, 32 // 2 ** s, 40 // 2 ** s, 3)
    assert item[("K", 0)].shape == (4, 4, 4)
    assert "depth_gt" not in item  # training mode


def test_video_clips_eval_has_depth(scared_tree):
    root, filenames, _ = scared_tree
    ds = ScaredVideoClips(root, filenames, height=32, width=40, is_train=False, T=4)
    item = ds[0]
    assert item["depth_gt"].shape[0] == 4
    assert item["depth_gt"].shape[-1] == 1


def test_scared_videos_sequence(scared_tree):
    root, filenames, (h, w, n) = scared_tree
    ds = ScaredVideos(root, filenames)
    seq = ds[0]
    assert seq["colors"].shape == (n, h, w, 3)
    assert seq["depths"].shape == (n, h, w)
    assert seq["poses"].shape == (n, 4, 4)
    assert seq["Ks"].shape == (n, 4, 4)
    np.testing.assert_allclose(seq["Ks"][0, 0, 0], 0.82 * w, rtol=1e-6)


def test_loader_batching(scared_tree):
    root, filenames, _ = scared_tree
    ds = ScaredVideoClips(root, filenames, height=32, width=40, is_train=True, T=2)
    loader = Loader(ds, batch_size=2, shuffle=True)
    batch = next(iter(loader))
    assert batch[("color", 0, 0)].shape == (2, 2, 32, 40, 3)
    assert len(loader) == len(ds) // 2


def test_scaled_intrinsics_pyramid():
    K0, iK0 = scaled_intrinsics(320, 256, 0)
    K1, _ = scaled_intrinsics(320, 256, 1)
    np.testing.assert_allclose(K0[0, 0], 0.82 * 320)
    np.testing.assert_allclose(K1[0, 0], 0.82 * 160)
    np.testing.assert_allclose(iK0 @ K0, np.eye(4), atol=1e-5)


def test_color_jitter_invariants():
    img = RNG.uniform(0.1, 0.9, (16, 20, 3)).astype(np.float32)
    ident = {"order": [0, 1, 2, 3], "brightness": 1.0, "contrast": 1.0, "saturation": 1.0, "hue": 0.0}
    np.testing.assert_allclose(apply_color_jitter(img, ident), img, atol=1e-5)

    bright = dict(ident, brightness=1.1)
    np.testing.assert_allclose(apply_color_jitter(img, bright), np.clip(img * 1.1, 0, 1), atol=1e-5)

    # saturation on a gray image is a no-op
    gray = np.repeat(RNG.uniform(0.2, 0.8, (8, 8, 1)).astype(np.float32), 3, axis=-1)
    sat = dict(ident, saturation=1.2)
    np.testing.assert_allclose(apply_color_jitter(gray, sat), gray, atol=1e-5)

    # full hue cycle is identity
    cyc = dict(ident, hue=1.0)
    np.testing.assert_allclose(apply_color_jitter(img, cyc), img, atol=1e-4)

    params = sample_color_jitter(np.random.default_rng(0))
    out = apply_color_jitter(img, params)
    assert out.shape == img.shape and np.isfinite(out).all()
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


def test_loader_num_workers_deterministic():
    """Batch order and contents must be identical for any worker count."""
    from endodav_tpu.data.loader import Loader

    class DS:
        epoch = 0

        def __len__(self):
            return 23

        def __getitem__(self, i):
            rng = np.random.default_rng((self.epoch, i))
            return {"x": rng.uniform(size=(4,)).astype(np.float32) + i}

    def run(workers):
        ld = Loader(DS(), batch_size=4, shuffle=True, seed=5, num_workers=workers)
        return [b["x"].copy() for _ in range(2) for b in ld]  # two epochs

    a, b, c = run(1), run(3), run(8)
    assert len(a) == len(b) == len(c) == 10
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)


def test_native_decode_parity(scared_tree):
    """C++ decode pipeline must match the PIL/cv2 path bit-exactly."""
    from endodav_tpu import native

    if not native.available():
        pytest.skip("native decoder toolchain unavailable")
    from endodav_tpu.data.readers import list_frames, read_image, read_scared_depth

    root, filenames, _ = scared_tree
    paths = list_frames(os.path.join(root, filenames[0]))
    from PIL import Image

    for p in paths["left"][:3]:
        with open(p, "rb") as f, Image.open(f) as img:
            want = np.asarray(img.convert("RGB"))
        np.testing.assert_array_equal(native.decode_rgb(p), want)
    import cv2

    for p in paths["depth"][:3]:
        want = cv2.imread(p, 3).astype(np.float32)[0:1024, :, 0]
        np.testing.assert_array_equal(native.decode_tiff_f32(p, rows=1024), want)
    batch = native.decode_rgb_batch(paths["left"], threads=4)
    assert batch.shape[0] == len(paths["left"])
    np.testing.assert_array_equal(batch[0], native.decode_rgb(paths["left"][0]))


def test_native_jpeg_parity(tmp_path):
    from endodav_tpu import native

    if not native.available():
        pytest.skip("native decoder toolchain unavailable")
    import cv2

    img = RNG.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    p = str(tmp_path / "f.jpg")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [cv2.IMWRITE_JPEG_QUALITY, 95])
    got = native.decode_rgb(p)
    want = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    # libjpeg IDCT may differ from cv2's by +-1 LSB
    assert got.shape == want.shape
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 1.0
