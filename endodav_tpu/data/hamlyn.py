"""Hamlyn dataset loaders.

Counterparts of datasets/hamlyn_video_dataset.py:
  * `HamlynVideos` (:69-103): full-sequence loader reading
    image01/*.{png,jpg} frames and depth01/*.png depths into RAM, with
    the `pred_root` npy re-eval mode and `max_length` truncation.
  * `HamlynFrames` (:106-268): frame-level eval set scanning all
    rectified* dirs; sequences > 13 are cropped to box (180, 0, 590, 288).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from endodav_tpu.data import pipeline, readers

__all__ = ["HamlynVideos", "HamlynFrames"]


def _read_depth_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32)


def _sorted_images(d: str, max_length=None):
    files = [f for f in sorted(os.listdir(d), key=lambda x: int(os.path.splitext(x)[0]))
             if f.lower().endswith((".png", ".jpg"))]
    if max_length is not None:
        files = files[:max_length]
    return [os.path.join(d, f) for f in files]


class HamlynVideos:
    def __init__(self, data_path: str, filenames: list[str], pred_root: str | None = None,
                 max_length: int | None = None):
        self.data_path = data_path
        self.filenames = filenames
        self.pred_root = pred_root
        self.max_length = max_length

    def __len__(self):
        return len(self.filenames)

    def _depths(self, seq_dir: str) -> np.ndarray:
        files = sorted(os.listdir(seq_dir))
        if self.max_length is not None:
            files = files[: self.max_length]
        out = []
        for f in files:
            p = os.path.join(seq_dir, f)
            if f.endswith(".png"):
                out.append(_read_depth_png(p))
            elif f.endswith(".npy"):
                out.append(np.load(p).astype(np.float32))
        return np.stack(out, axis=0)

    def __getitem__(self, index: int) -> dict:
        filename = self.filenames[index]
        kd = os.path.join(self.data_path, filename)
        if self.pred_root is not None:
            depths = self._depths(os.path.join(kd, "depth01"))
            preds = self._depths(os.path.join(self.pred_root, filename, "depth"))
            assert len(depths) == len(preds)
            return {"depths": depths, "pred_depths": preds, "filename": filename}
        colors = np.stack(
            [readers.read_image(p) for p in _sorted_images(os.path.join(kd, "image01"), self.max_length)],
            axis=0,
        )
        depths = self._depths(os.path.join(kd, "depth01"))
        assert len(colors) == len(depths)
        return {"colors": colors, "depths": depths, "filename": filename}

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class HamlynFrames:
    """Frame-level eval set; crop box (180, 0, 590, 288) for sequences > 13."""

    BOX = (180, 0, 590, 288)  # (left, top, right, bottom)

    def __init__(self, data_path: str, height: int, width: int, num_scales: int = 4):
        self.data_path = data_path
        self.height = height
        self.width = width
        self.num_scales = num_scales
        self.scans = []
        rectified = sorted(os.path.join(data_path, f) for f in os.listdir(data_path))
        for rdir in rectified:
            for img_path in sorted(glob.glob(os.path.join(rdir, "image01", "*.jpg"))):
                name = os.path.basename(img_path)
                depth_path = os.path.join(rdir, "depth01", name[:-4] + ".png")
                if os.path.exists(depth_path):
                    self.scans.append(
                        {"image": img_path, "depth": depth_path, "sequence": int(rdir[-2:])}
                    )

    def __len__(self):
        return len(self.scans)

    def __getitem__(self, index: int) -> dict:
        scan = self.scans[index]
        img = readers.read_image(scan["image"]).astype(np.float32) / 255.0
        depth = _read_depth_png(scan["depth"])
        if scan["sequence"] > 13:
            l, t, r, b = self.BOX
            img = img[t:b, l:r]
            depth = depth[:, l:r]
        img = pipeline.resize_frames(img[None], (self.height, self.width))[0]
        return {("color", 0, 0): img, "depth_gt": depth[..., None], "sequence": scan["sequence"]}
