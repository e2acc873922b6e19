"""Device preprocessing (pyramid + jitter on device) vs host pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from endodav_tpu.data import pipeline
from endodav_tpu.ops.jitter import device_color_jitter, device_pyramid

RNG = np.random.default_rng(8)


def test_device_jitter_matches_host():
    img = RNG.uniform(0.05, 0.95, (3, 16, 20, 3)).astype(np.float32)
    params = {"order": np.array([2, 0, 3, 1]), "brightness": 1.15, "contrast": 0.85,
              "saturation": 1.1, "hue": 0.07}
    host = pipeline.apply_color_jitter(img, params)
    dev = device_color_jitter(
        jnp.asarray(img),
        jnp.asarray(params["order"], jnp.int32),
        jnp.asarray([params["brightness"], params["contrast"], params["saturation"], params["hue"]],
                    jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(dev), host, atol=3e-5)


def test_device_jitter_identity_is_near_exact():
    img = RNG.uniform(0, 1, (2, 8, 10, 3)).astype(np.float32)
    dev = device_color_jitter(
        jnp.asarray(img), jnp.arange(4, dtype=jnp.int32), jnp.asarray([1.0, 1.0, 1.0, 0.0])
    )
    # contrast f=1 computes (x-mean)+mean, one f32 rounding from identity
    np.testing.assert_allclose(np.asarray(dev), img, atol=1e-7)


def test_device_pyramid_matches_host_pipeline():
    # host: build_pyramid from native frames; device: pyramid from the
    # host-resized scale-0 stack — must agree at every scale
    frames = RNG.uniform(0, 1, (4, 64, 80, 3)).astype(np.float32)
    h, w = 32, 40
    params = {"order": np.array([1, 3, 0, 2]), "brightness": 0.9, "contrast": 1.1,
              "saturation": 0.95, "hue": -0.05}
    host_c, host_a = pipeline.build_pyramid(frames, h, w, 4, params)

    scale0 = pipeline.resize_frames(frames, (h, w))
    dev_c, dev_a = device_pyramid(
        jnp.asarray(scale0), 4,
        jnp.asarray(params["order"], jnp.int32),
        jnp.asarray([params["brightness"], params["contrast"], params["saturation"], params["hue"]],
                    jnp.float32),
    )
    for s in range(4):
        np.testing.assert_allclose(np.asarray(dev_c[s]), host_c[s], atol=2e-4)
        np.testing.assert_allclose(np.asarray(dev_a[s]), host_a[s], atol=5e-4)


def test_dataset_device_preprocess_keys(tmp_path):
    import cv2
    import json
    import os

    from endodav_tpu.data import ScaredVideoClips

    base = tmp_path / "train/dataset1/keyframe1/data"
    for sub in ("left", "right", "scene_points", "frame_data"):
        os.makedirs(base / sub, exist_ok=True)
    for i in range(12):
        cv2.imwrite(str(base / "left" / f"{i:06d}.png"),
                    RNG.integers(0, 255, (64, 80, 3), dtype=np.uint8))
        cv2.imwrite(str(base / "scene_points" / f"sp{i:06d}.tiff"),
                    np.ones((64, 80, 3), np.float32) * 50)
        with open(base / "frame_data" / f"fd{i:06d}.json", "w") as f:
            json.dump({"camera-pose": np.eye(4).tolist()}, f)

    ds = ScaredVideoClips(str(tmp_path), ["train/dataset1/keyframe1"], 32, 40,
                          is_train=True, T=2, device_preprocess=True)
    item = ds[0]
    assert item[("frames_scale0",)].shape == (4, 32, 40, 3)  # T+2 frames at scale 0
    assert item[("jitter_order",)].shape == (4,)
    assert item[("jitter_factors",)].shape == (4,)
    assert ("color", 0, 0) not in item
    assert item[("K", 0)].shape == (2, 4, 4)


def _make_tree(tmp_path, n=24):
    import cv2
    import json
    import os

    base = tmp_path / "train/dataset1/keyframe1/data"
    for sub in ("left", "right", "scene_points", "frame_data"):
        os.makedirs(base / sub, exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(base / "left" / f"{i:06d}.png"),
                    RNG.integers(0, 255, (64, 80, 3), dtype=np.uint8))
        cv2.imwrite(str(base / "scene_points" / f"sp{i:06d}.tiff"),
                    np.ones((64, 80, 3), np.float32) * 50)
        with open(base / "frame_data" / f"fd{i:06d}.json", "w") as f:
            json.dump({"camera-pose": np.eye(4).tolist()}, f)


def test_random_capable_single_signature(tmp_path):
    """random_train alternation must not change the batch signature: both
    phases ship a [3T] stack + [3,T] window map (VERDICT round-1 item 6)."""
    from endodav_tpu.data import ScaredVideoClips

    _make_tree(tmp_path)
    ds = ScaredVideoClips(str(tmp_path), ["train/dataset1/keyframe1"], 32, 40,
                          is_train=True, T=2, device_preprocess=True,
                          random_capable=True)
    ds.random_train = False
    clip = ds[0]
    ds.random_train = True
    rnd = ds[0]
    sig = lambda item: {k: (v.shape, v.dtype) for k, v in sorted(item.items(), key=str)}
    assert sig(clip) == sig(rnd)
    assert clip[("frames_scale0",)].shape == (6, 32, 40, 3)  # 3T
    assert clip[("frame_window_map",)].shape == (3, 2)
    # contiguous sub-mode: fi0 row precedes fi-1 and fi+1 rows in the stack
    np.testing.assert_array_equal(clip[("frame_window_map",)],
                                  [[0, 1], [2, 3], [4, 5]])


def test_random_capable_contiguous_matches_host_pipeline(tmp_path):
    """The [3T]-stack contiguous layout must reproduce the host path's
    per-frame windows exactly (same seed => same sampling draws)."""
    from endodav_tpu.data import ScaredVideoClips

    _make_tree(tmp_path)
    mk = lambda **kw: ScaredVideoClips(str(tmp_path), ["train/dataset1/keyframe1"],
                                       32, 40, is_train=True, T=2, seed=7, **kw)
    host = mk(device_preprocess=False)[1]
    dev = mk(device_preprocess=True, random_capable=True)[1]

    stack = jnp.asarray(dev[("frames_scale0",)])
    colors, colors_aug = device_pyramid(
        stack, 4,
        jnp.asarray(dev[("jitter_order",)], jnp.int32),
        jnp.asarray(dev[("jitter_factors",)], jnp.float32),
    )
    wmap = dev[("frame_window_map",)]
    for s in range(4):
        for fi_i, fi in enumerate((0, -1, 1)):
            got_c = np.asarray(colors[s])[wmap[fi_i]]
            got_a = np.asarray(colors_aug[s])[wmap[fi_i]]
            np.testing.assert_allclose(got_c, host[("color", fi, s)], atol=2e-4)
            np.testing.assert_allclose(got_a, host[("color_aug", fi, s)], atol=5e-4)
