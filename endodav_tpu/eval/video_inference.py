"""Sliding-window full-video depth inference, batched for TPU.

Re-design of `endodav.infer_video_depth` (models/endodav/endodav.py:162-254).

The reference runs windows *sequentially* because each window's first
OVERLAP inputs are keyframe-carried copies of the previous window's
inputs (:198-199).  But that recurrence touches only the *input frame
indices*, never model outputs — so every window's 32-frame index list is
computable upfront (`window_indices`) and all windows batch onto the TPU
in one (or a few) forward passes.  Only the scale/shift stitch (:218-252)
stays sequential, and it is a tiny closed-form fit per boundary done
host-side on the already-transferred depth maps.

Preprocessing parity: the reference cv2-INTER_CUBIC keep-aspect
lower-bound resize to a multiple of 14 (util/transform.py:5-122) is the
same bicubic a=-0.75 / half-pixel mapping as our `resize2d` bicubic, and
runs on device.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from endodav_tpu.eval.metrics import compute_scale_and_shift, interpolate_frames
from endodav_tpu.models.endodav import INFER_LEN, INTERP_LEN, KEYFRAMES, OVERLAP
from endodav_tpu.ops.resize import resize2d

__all__ = ["window_indices", "keep_aspect_size", "infer_video_depth", "infer_video_depth_single_frame"]


def keep_aspect_size(h: int, w: int, target_h: int, target_w: int, multiple: int = 14):
    """lower_bound keep-aspect target size, multiple-of-14
    (util/transform.py:48-100)."""
    scale = max(target_w / w, target_h / h)

    def constrain(x, min_val):
        y = round(x / multiple) * multiple
        if y < min_val:
            y = math.ceil(x / multiple) * multiple
        return int(y)

    return constrain(scale * h, target_h), constrain(scale * w, target_w)


def window_indices(n_frames: int) -> np.ndarray:
    """[num_windows, INFER_LEN] source-frame index per window slot.

    Resolves the keyframe-carry input recurrence (endodav.py:186-199)
    into static indices: window 0 reads frames [0..31]; window k's first
    OVERLAP slots replay window k-1's KEYFRAMES slots and the rest read
    fresh frames.  Frames past the end are clamped to the padded last
    frame, matching the reference's list padding (:188-189).
    """
    step = INFER_LEN - OVERLAP
    # replicate the reference loop bound: range(0, n_frames, step)
    starts = list(range(0, n_frames, step))
    idx = np.zeros((len(starts), INFER_LEN), dtype=np.int64)
    kf = np.asarray(KEYFRAMES, dtype=np.int64)
    for wi, s in enumerate(starts):
        fresh = np.clip(np.arange(s, s + INFER_LEN), 0, n_frames - 1)
        idx[wi] = fresh
        if wi > 0:
            idx[wi, :OVERLAP] = idx[wi - 1, kf]
    return idx


def _stitch(depth_windows: np.ndarray, n_frames: int) -> np.ndarray:
    """Sequential scale/shift stitch + overlap cross-fade (endodav.py:218-252).

    depth_windows: [num_windows, INFER_LEN, H, W] raw per-window depth.
    Returns [n_frames, H, W].
    """
    align_len = OVERLAP - INTERP_LEN
    aligned: list[np.ndarray] = []
    for wi in range(depth_windows.shape[0]):
        win = depth_windows[wi]
        if wi == 0:
            aligned.extend(win)
            continue
        pre = aligned[-INTERP_LEN:]
        post = [win[i] for i in range(align_len, OVERLAP)]
        scale, shift = compute_scale_and_shift(np.concatenate(post), np.concatenate(pre))
        post = [np.maximum(f * scale + shift, 0.0) for f in post]
        aligned[-INTERP_LEN:] = interpolate_frames(pre, post)
        for i in range(OVERLAP, INFER_LEN):
            aligned.append(np.maximum(win[i] * scale + shift, 0.0))
    return np.stack(aligned[:n_frames], axis=0)


def infer_video_depth(
    forward_windows: Callable[[jnp.ndarray], jnp.ndarray],
    frames: np.ndarray,
    image_shape: tuple[int, int] = (224, 280),
    chunk_windows: int = 2,
) -> np.ndarray:
    """Full-video sigmoid-disparity inference.

    forward_windows: jitted fn [C, INFER_LEN, h, w, 3] -> [C*INFER_LEN, h', w', 1]
      (the EndoDAV forward returning ("disp", 0); see `make_window_forward`).
    frames: [N, H, W, 3] uint8 or float in [0, 255]/[0, 1].
    Returns raw stitched disparity [N, H, W] at original resolution —
    callers apply `disp_to_depth` exactly as the reference does
    (evaluate_depth_video.py:167-170).
    """
    n, fh, fw, _ = frames.shape
    if frames.dtype == np.uint8 or frames.max() > 1.5:
        frames = frames.astype(np.float32) / 255.0
    th, tw = keep_aspect_size(fh, fw, *image_shape)

    idx = window_indices(n)
    num_windows = idx.shape[0]

    frames_dev = jnp.asarray(frames)
    frames_dev = resize2d(frames_dev, (th, tw), "bicubic", align_corners=False)

    outs = []
    pad_to = math.ceil(num_windows / chunk_windows) * chunk_windows
    idx_padded = np.concatenate([idx, np.repeat(idx[-1:], pad_to - num_windows, axis=0)], axis=0)
    for c0 in range(0, pad_to, chunk_windows):
        widx = jnp.asarray(idx_padded[c0 : c0 + chunk_windows])
        win_frames = jnp.take(frames_dev, widx.reshape(-1), axis=0)
        win_frames = win_frames.reshape(chunk_windows, INFER_LEN, th, tw, 3)
        disp = forward_windows(win_frames)  # [C*T, h', w', 1]
        disp = resize2d(disp, (fh, fw), "bilinear", align_corners=True)
        outs.append(np.asarray(disp[..., 0]))
    depth_windows = np.concatenate(outs, axis=0)[: num_windows * INFER_LEN]
    depth_windows = depth_windows.reshape(num_windows, INFER_LEN, fh, fw)
    return _stitch(depth_windows, n)


def infer_video_depth_single_frame(
    forward_batch: Callable[[jnp.ndarray], jnp.ndarray],
    frames: np.ndarray,
    batch_size: int = 8,
) -> np.ndarray:
    """Chunked frame-independent inference (endodac.infer_video_depth,
    models/endodac/endodac.py:259-272).  Returns [N, H, W] disparity at
    original resolution."""
    n, fh, fw, _ = frames.shape
    if frames.dtype == np.uint8 or frames.max() > 1.5:
        frames = frames.astype(np.float32) / 255.0
    outs = []
    pad_to = math.ceil(n / batch_size) * batch_size
    frames = np.concatenate([frames, np.repeat(frames[-1:], pad_to - n, axis=0)], axis=0)
    for c0 in range(0, pad_to, batch_size):
        batch = jnp.asarray(frames[c0 : c0 + batch_size])
        disp = forward_batch(batch)  # [B, h', w', 1]
        disp = resize2d(disp, (fh, fw), "bilinear", align_corners=True)
        outs.append(np.asarray(disp[..., 0]))
    return np.concatenate(outs, axis=0)[:n]
