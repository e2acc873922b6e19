#!/usr/bin/env python
"""Interactive RGBD / point-cloud viewer — `tools/viser-rgbd` parity.

Streams predicted-or-GT depth + RGB sequences as animated 3D point
clouds in the browser via `viser` (playback slider / prev-next / FPS
controls, matching the reference's point_cloud_visualizer.py UI).  In
zero-egress environments without viser it falls back to exporting PLY
files (openable in MeshLab / CloudCompare).

Dataset loaders mirror the reference's utils/{scared,hamlyn,endonerf}_loader.py:

  scared   rgb data/left/*.png; depth GT data/scene_points/*.tiff (/30)
           or scene_points_left/*.npy, pred *.npy (/40000); K from
           frame_data json when present
  hamlyn   rgb image01/*.jpg; depth GT depth01/*.png (/200), pred (/50)
  endonerf rgb images/*.png; depth GT depth/*.png (/100), pred (/50)

Usage:
  python tools/view_rgbd.py --data_type scared \
      --data_path <.../dataset1/keyframe1> [--pred_root <npy dir>] \
      [--downsample_factor 8] [--max_frames 100] [--ply_out out/]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# camera-to-world flip used by the reference for display (scared_loader.py:31-35)
T_WORLD_CAMERA = np.array(
    [[1.0, 0.0, 0.0, 0.0], [0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0]], np.float32
)
DEFAULT_K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1.0]], np.float32)


def _sorted(d, pattern):
    return sorted(glob.glob(os.path.join(d, pattern)))


class _Loader:
    """(rgb uint8, metric depth f32, K 3x3) per frame."""

    fps = 30

    def __init__(self, data_path: str, pred_root: str | None, data_type: str):
        self.data_type = data_type
        self.is_pred = pred_root is not None
        if data_type == "scared":
            self.rgb = _sorted(os.path.join(data_path, "data", "left"), "*.png")
            if self.is_pred:
                self.depth = _sorted(pred_root, "*.npy")
            else:
                self.depth = (_sorted(os.path.join(data_path, "data", "scene_points_left"), "*.npy")
                              or _sorted(os.path.join(data_path, "data", "scene_points"), "*.tiff"))
            self.meta = _sorted(os.path.join(data_path, "data", "frame_data"), "*.json")
        elif data_type == "hamlyn":
            self.rgb = _sorted(os.path.join(data_path, "image01"), "*.jpg")
            self.depth = (_sorted(pred_root, "*.npy") if self.is_pred
                          else _sorted(os.path.join(data_path, "depth01"), "*.png"))
            self.meta = []
        elif data_type == "endonerf":
            self.rgb = _sorted(os.path.join(data_path, "images"), "*.png")
            self.depth = (_sorted(pred_root, "*.npy") if self.is_pred
                          else _sorted(os.path.join(data_path, "depth"), "*.png"))
            self.meta = []
        else:
            raise SystemExit(f"unknown --data_type {data_type}")
        if not self.rgb or not self.depth:
            raise SystemExit(f"no frames found under {data_path} (pred_root={pred_root})")

    def num_frames(self):
        return min(len(self.rgb), len(self.depth))

    def get_frame(self, i: int):
        import cv2

        rgb = cv2.cvtColor(cv2.imread(self.rgb[i]), cv2.COLOR_BGR2RGB)
        dp = self.depth[i]
        if dp.endswith(".npy"):
            depth = np.load(dp).astype(np.float32)
            if depth.ndim == 3:
                depth = depth[0]
        else:
            depth = cv2.imread(dp, cv2.IMREAD_UNCHANGED).astype(np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
        if self.data_type == "scared":
            depth = depth[:1024]
            depth = depth / (40000.0 if self.is_pred else 30.0)
        elif self.data_type == "hamlyn":
            depth = depth / (50.0 if self.is_pred else 200.0)
        else:
            depth = depth / (50.0 if self.is_pred else 100.0)

        K = DEFAULT_K
        if i < len(self.meta):
            with open(self.meta[i]) as f:
                m = json.load(f)
            calib = m.get("camera-calibration", {})
            if "KL" in calib:
                K = np.asarray(calib["KL"], np.float32)
        return rgb, depth, K


def _point_cloud(rgb, depth, K, downsample):
    """World-frame points + colors (scared_loader.py get_point_cloud)."""
    import cv2

    rgb = rgb[::downsample, ::downsample]
    depth = cv2.resize(depth, (rgb.shape[1], rgb.shape[0]), interpolation=cv2.INTER_NEAREST)
    h, w = depth.shape
    grid = np.stack(np.meshgrid(np.arange(w), np.arange(h)), 2).astype(np.float32) + 0.5
    grid = grid * downsample
    homo = np.concatenate([grid.reshape(-1, 2), np.ones((h * w, 1), np.float32)], 1)
    local = homo @ np.linalg.inv(K).T
    dirs = local @ T_WORLD_CAMERA[:3, :3].T
    pts = T_WORLD_CAMERA[:, -1] + dirs * depth.reshape(-1, 1)
    return pts.astype(np.float32), rgb.reshape(-1, 3)


def _serve_viser(clouds, fps, port):
    import time

    import viser

    server = viser.ViserServer(port=port)
    n = len(clouds)
    with server.gui.add_folder("Playback"):
        gui_t = server.gui.add_slider("Timestep", min=0, max=n - 1, step=1, initial_value=0)
        gui_next = server.gui.add_button("Next Frame")
        gui_prev = server.gui.add_button("Prev Frame")
        gui_play = server.gui.add_checkbox("Playing", True)
        gui_fps = server.gui.add_slider("FPS", min=1, max=60, step=0.1, initial_value=fps)

    nodes = []
    for i, (pts, cols) in enumerate(clouds):
        nodes.append(server.scene.add_point_cloud(
            f"/frames/t{i}", points=pts, colors=cols.astype(np.uint8),
            point_size=0.5, visible=(i == 0)))

    @gui_next.on_click
    def _(_):
        gui_t.value = (gui_t.value + 1) % n

    @gui_prev.on_click
    def _(_):
        gui_t.value = (gui_t.value - 1) % n

    @gui_t.on_update
    def _(_):
        for i, node in enumerate(nodes):
            node.visible = i == gui_t.value

    print(f"viser server on :{port} — ctrl-c to stop")
    while True:
        if gui_play.value:
            gui_t.value = (gui_t.value + 1) % n
        time.sleep(1.0 / gui_fps.value)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True, help="sequence directory")
    p.add_argument("--data_type", default="scared", choices=["scared", "hamlyn", "endonerf"])
    p.add_argument("--pred_root", default=None, help="predicted-depth npy dir (GT used if absent)")
    p.add_argument("--sequence", default=None, help="appended to data_path/pred_root when given")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--downsample_factor", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--ply_out", default=None, help="fallback PLY output dir")
    args = p.parse_args()

    data_path = args.data_path
    pred_root = args.pred_root
    if args.sequence:
        data_path = os.path.join(data_path, args.sequence)
        if pred_root:
            pred_root = os.path.join(pred_root, args.sequence, "depth")

    loader = _Loader(data_path, pred_root, args.data_type)
    idx = range(0, min(loader.num_frames(), args.max_frames * args.stride), args.stride)
    clouds = []
    for i in idx:
        rgb, depth, K = loader.get_frame(i)
        clouds.append(_point_cloud(rgb, depth, K, args.downsample_factor))
    print(f"loaded {len(clouds)} frames")

    try:
        _serve_viser(clouds, loader.fps, args.port)
    except ImportError:
        out = args.ply_out or os.path.join(data_path, "ply")
        os.makedirs(out, exist_ok=True)
        from endodav_tpu.cli.visualize import save_pointcloud

        for i, (pts, cols) in enumerate(clouds):
            save_pointcloud(os.path.join(out, f"{i:06d}.ply"), pts, cols)
        print(f"viser not installed; exported {len(clouds)} PLY clouds to {out}")


if __name__ == "__main__":
    main()
