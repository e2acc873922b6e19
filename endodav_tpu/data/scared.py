"""SCARED dataset: training clip sampler + whole-sequence eval loader.

Counterparts of datasets/scared_video_dataset.py:
  * `ScaredVideoClips` — SCAREDRAWVideoDataset (:124-371): flattens all
    keyframe dirs into global frame lists, samples length-T clips with
    per-frame random step <= frame_max_interval (:249-253), a
    `random_train` mode of T independent frames (:267-286), shared
    color jitter + 4-scale cascaded pyramid, per-scale K, GT depth only
    when not training (:299-300).
  * `ScaredVideos` — whole-sequence RAM loader for eval (:77-121),
    iterated directly (no DataLoader), incl. the `pred_root` re-eval mode.
  * `ScaredFrames` — monodepth-style frame dataset for the endovis split
    (datasets/mono_dataset.py:24-223 + scared_dataset.py:13-85).

Outputs are numpy, channels-last; batching happens in `data.loader`.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from endodav_tpu.data import pipeline, readers

__all__ = ["ScaredVideoClips", "ScaredVideos", "ScaredFrames"]


class ScaredVideoClips:
    def __init__(
        self,
        data_path: str,
        filenames: list[str],
        height: int,
        width: int,
        frame_idxs=(0, -1, 1),
        num_scales: int = 4,
        is_train: bool = False,
        T: int = 4,
        frame_max_interval: int = 1,
        seed: int = 314,
        device_preprocess: bool = False,
        random_capable: bool = False,
    ):
        assert tuple(frame_idxs) == (0, -1, 1), "video trainer requires frame_ids [0,-1,1]"
        self.data_path = data_path
        self.height = height
        self.width = width
        self.frame_idxs = tuple(frame_idxs)
        self.num_scales = num_scales
        self.is_train = is_train
        self.T = T
        self.frame_max_interval = frame_max_interval
        self.random_train = False
        # random_capable keeps ONE jit signature across the depth<->pose
        # random_train alternation (scared_video_dataset.py:267-286): both
        # sub-modes ship a [3T] scale-0 stack + explicit per-frame window
        # map instead of the contiguous [T+2] stack + static slices.
        self.random_capable = random_capable
        self.load_depth = not is_train
        self.device_preprocess = device_preprocess
        self.seed = seed
        # bumped by the Loader each epoch so repeated indices resample;
        # per-item rngs keep sampling deterministic under ANY worker count
        # (the torch DataLoader's per-worker rngs are not)
        self.epoch = 0

        self.paths = {"left": [], "right": [], "depth": [], "pose": []}
        for filename in filenames:
            p = readers.list_frames(os.path.join(data_path, filename))
            n = len(p["left"])
            assert n > 0, f"no frames under {filename}"
            for k in self.paths:
                self.paths[k].extend(p[k] if p[k] else [None] * n)

    def __len__(self):
        n = len(self.paths["left"])
        length = n - self.T - (len(self.frame_idxs) - 1) + 1 - self.frame_max_interval * self.T
        return max(0, length // self.T)

    def _load_colors(self, indices, flip: bool) -> np.ndarray:
        paths = [self.paths["left"][i] for i in indices]
        from endodav_tpu import native

        if native.available() and not any(p is None for p in paths):
            try:
                stack = native.decode_rgb_batch(paths, threads=2).astype(np.float32) / 255.0
                return stack[:, :, ::-1] if flip else stack
            except IOError:
                pass  # mixed sizes / odd encodings: per-frame fallback
        frames = []
        for p in paths:
            img = readers.read_image(p).astype(np.float32) / 255.0
            if flip:
                img = img[:, ::-1]
            frames.append(img)
        return np.stack(frames, axis=0)

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, int(index), int(self.random_train)])
        )
        index = index * self.T + int(rng.integers(0, self.T))
        if self.frame_max_interval > 1:
            frame_steps = rng.integers(1, self.frame_max_interval, size=self.T + 2)
        else:
            frame_steps = np.ones(self.T + 2, dtype=np.int64)
        do_aug = self.is_train and rng.random() > 0.5
        do_flip = self.is_train and rng.random() > 0.5
        jit = pipeline.sample_color_jitter(rng) if do_aug else None

        inputs = {}
        if self.device_preprocess:
            # ship only the scale-0 stack + jitter params; the pyramid,
            # per-scale jitter and window slicing happen on device
            # (ops/jitter.device_pyramid — exact math parity).  The stack
            # layout depends on random_capable (NOT on the per-step
            # random_train flag, so the jit signature stays constant):
            #   plain:          [T+2] contiguous + window map (1+fi..T+fi)
            #   random_capable: [3T] frames (one triplet per slot) + map
            if self.random_capable:
                t = self.T
                if self.random_train:
                    n = len(self.paths["left"])
                    base = rng.integers(self.frame_max_interval,
                                        n - self.frame_max_interval - 1, size=t)
                    steps = frame_steps[:t]
                    stack_idx = np.concatenate([base, base - steps, base + steps])
                else:
                    idx_all = np.asarray(
                        [index + fi * int(frame_steps[fi]) for fi in range(t + 2)]
                    )
                    stack_idx = np.concatenate(
                        [idx_all[1 : t + 1], idx_all[0:t], idx_all[2 : t + 2]]
                    )
                colors = self._load_colors(stack_idx, do_flip)
                wmap = np.stack([np.arange(t), t + np.arange(t), 2 * t + np.arange(t)])
            else:
                indices_all = [index + fi * int(frame_steps[fi]) for fi in range(self.T + 2)]
                colors = self._load_colors(indices_all, do_flip)
                base_r = np.arange(self.T)
                wmap = np.stack([1 + base_r, base_r, 2 + base_r])
            inputs[("frames_scale0",)] = pipeline.resize_frames(colors, (self.height, self.width))
            inputs[("frame_window_map",)] = wmap.astype(np.int32)  # rows: fi 0, -1, +1
            if jit is not None:
                inputs[("jitter_order",)] = np.asarray(jit["order"], np.int32)
                inputs[("jitter_factors",)] = np.asarray(
                    [jit["brightness"], jit["contrast"], jit["saturation"], jit["hue"]], np.float32
                )
            else:
                inputs[("jitter_order",)] = np.arange(4, dtype=np.int32)
                inputs[("jitter_factors",)] = np.asarray([1.0, 1.0, 1.0, 0.0], np.float32)
            for s in range(self.num_scales):
                K, inv_K = pipeline.scaled_intrinsics(self.width, self.height, s)
                inputs[("K", s)] = np.repeat(K[None], self.T, axis=0)
                inputs[("inv_K", s)] = np.repeat(inv_K[None], self.T, axis=0)
            return inputs
        if self.random_train:
            n = len(self.paths["left"])
            base = rng.integers(self.frame_max_interval, n - self.frame_max_interval - 1, size=self.T)
            for fi, offs in ((0, 0), (1, frame_steps[: self.T]), (-1, -frame_steps[: self.T])):
                colors = self._load_colors(base + offs, do_flip)
                cs, cas = pipeline.build_pyramid(colors, self.height, self.width, self.num_scales, jit)
                for s in range(self.num_scales):
                    inputs[("color", fi, s)] = cs[s]
                    inputs[("color_aug", fi, s)] = cas[s]
            indices = base
        else:
            indices_all = [index + fi * int(frame_steps[fi]) for fi in range(self.T + 2)]
            indices = indices_all[1:-1]
            colors = self._load_colors(indices_all, do_flip)
            cs, cas = pipeline.build_pyramid(colors, self.height, self.width, self.num_scales, jit)
            for fi in self.frame_idxs:
                for s in range(self.num_scales):
                    inputs[("color", fi, s)] = cs[s][1 + fi : self.T + 1 + fi].copy()
                    inputs[("color_aug", fi, s)] = cas[s][1 + fi : self.T + 1 + fi].copy()

        if self.load_depth and self.paths["depth"][0] is not None:
            depths = []
            for i in indices:
                d = readers.read_scared_depth(self.paths["depth"][i])
                if do_flip:
                    d = d[:, ::-1]
                depths.append(d[..., None])
            inputs["depth_gt"] = np.stack(depths, axis=0)

        for s in range(self.num_scales):
            K, inv_K = pipeline.scaled_intrinsics(self.width, self.height, s)
            inputs[("K", s)] = np.repeat(K[None], self.T, axis=0)
            inputs[("inv_K", s)] = np.repeat(inv_K[None], self.T, axis=0)
        return inputs


class ScaredVideos:
    """Whole-sequence eval loader; yields dicts of full sequences."""

    def __init__(self, data_path: str, filenames: list[str], pred_root: str | None = None):
        self.data_path = data_path
        self.filenames = filenames
        self.pred_root = pred_root

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, index: int) -> dict:
        filename = self.filenames[index]
        if self.pred_root is not None:
            kd = os.path.join(self.data_path, filename)
            depth_paths = readers.list_frames(kd)["depth"]
            if not depth_paths:
                raise FileNotFoundError(f"no GT depth found under {kd}/data/scene_points")
            depths = np.stack([readers.read_scared_depth(p) for p in depth_paths], axis=0)
            pred_dir = os.path.join(self.pred_root, filename, "depth")
            pred_paths = sorted(glob.glob(os.path.join(pred_dir, "*.npy")))
            if not pred_paths:
                raise FileNotFoundError(f"no prediction .npy files under {pred_dir}")
            preds = np.stack([np.load(p).astype(np.float32) for p in pred_paths], axis=0)
            return {"depths": depths, "pred_depths": preds, "filename": filename}
        colors, depths, poses = readers.read_sequence(self.data_path, filename)
        h, w = colors.shape[1:3]
        K = pipeline.NORMALIZED_K.copy()
        K[0, :] *= w
        K[1, :] *= h
        return {
            "colors": colors,
            "depths": depths,
            "poses": poses,
            "Ks": np.repeat(K[None], len(colors), axis=0),
            "filename": filename,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class ScaredFrames:
    """Frame-level dataset for the endovis split (line format
    'folder frame_idx side'; path scheme mono_dataset.py:41-72)."""

    def __init__(
        self,
        data_path: str,
        filenames: list[str],
        height: int,
        width: int,
        frame_idxs=(0, -1, 1),
        num_scales: int = 4,
        is_train: bool = False,
        seed: int = 314,
    ):
        self.data_path = data_path
        self.filenames = filenames
        self.height = height
        self.width = width
        self.frame_idxs = tuple(frame_idxs)
        self.num_scales = num_scales
        self.is_train = is_train
        self.rng = np.random.default_rng(seed)
        self.side_map = {"l": "left", "r": "right"}

    def __len__(self):
        return len(self.filenames)

    @staticmethod
    def _split_prefix(folder: str) -> str:
        # dataset number < 8 lives under train/ (scared_dataset.py:44-48)
        return "train" if int(folder[7]) < 8 else "test"

    def _frame_path(self, folder: str, frame_index: int, side: str) -> str:
        return os.path.join(
            self.data_path, self._split_prefix(folder), folder, "data",
            self.side_map[side], f"{frame_index:010d}.png",
        )

    def _depth_path(self, folder: str, frame_index: int) -> str:
        return os.path.join(
            self.data_path, self._split_prefix(folder), folder, "data",
            "scene_points", f"scene_points{frame_index:06d}.tiff",
        )

    def get_pose(self, folder: str, frame_index: int) -> np.ndarray:
        """c2w pose (pinv of the stored w2c, scared_dataset.py:74-85)."""
        path = os.path.join(
            self.data_path, self._split_prefix(folder), folder, "data",
            "frame_data", f"frame_data{frame_index:06d}.json",
        )
        return np.linalg.pinv(readers.read_pose_json(path))

    def __getitem__(self, index: int) -> dict:
        rng = self.rng
        parts = self.filenames[index].split()
        folder = parts[0]
        frame_index = int(parts[1]) if len(parts) == 3 else 0
        side = parts[2] if len(parts) == 3 else "l"

        do_aug = self.is_train and rng.random() > 0.5
        do_flip = self.is_train and rng.random() > 0.5
        jit = pipeline.sample_color_jitter(rng) if do_aug else None

        inputs = {}
        for fi in self.frame_idxs:
            if fi == "s":
                path = self._frame_path(folder, frame_index, {"l": "r", "r": "l"}[side])
            else:
                path = self._frame_path(folder, frame_index + fi, side)
            img = readers.read_image(path).astype(np.float32) / 255.0
            if do_flip:
                img = img[:, ::-1]
            cs, cas = pipeline.build_pyramid(img[None], self.height, self.width, self.num_scales, jit)
            for s in range(self.num_scales):
                inputs[("color", fi, s)] = cs[s][0]
                inputs[("color_aug", fi, s)] = cas[s][0]

        if not self.is_train:
            dpath = self._depth_path(folder, frame_index)
            if os.path.exists(dpath):
                d = readers.read_scared_depth(dpath)
                if do_flip:
                    d = d[:, ::-1]
                inputs["depth_gt"] = d[..., None]

        for s in range(self.num_scales):
            K, inv_K = pipeline.scaled_intrinsics(self.width, self.height, s)
            inputs[("K", s)] = K
            inputs[("inv_K", s)] = inv_K

        if "s" in self.frame_idxs:
            stereo_T = np.eye(4, dtype=np.float32)
            baseline_sign = -1 if do_flip else 1
            side_sign = -1 if side == "l" else 1
            stereo_T[0, 3] = side_sign * baseline_sign * 0.1
            inputs["stereo_T"] = stereo_T
        return inputs
