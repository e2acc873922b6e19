#!/usr/bin/env python
"""Interactive RGBD / point-cloud viewer (tools/viser-rgbd parity).

Serves the predicted depth + RGB sequences as 3D point clouds in the
browser via `viser` when available; falls back to exporting PLY files
(openable in MeshLab/CloudCompare) in zero-egress environments.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--pred_root", required=True)
    p.add_argument("--sequence", required=True)
    p.add_argument("--stride", type=int, default=5)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--ply_out", default=None, help="fallback PLY output dir")
    args = p.parse_args()

    from endodav_tpu.cli.visualize import depth_to_pointcloud, save_pointcloud
    from endodav_tpu.data.pipeline import NORMALIZED_K
    from endodav_tpu.data.readers import list_frames, read_image

    paths = list_frames(os.path.join(args.data_path, args.sequence))
    depth_files = sorted(glob.glob(os.path.join(args.pred_root, args.sequence, "depth", "*.npy")))
    frames = list(zip(paths["left"], depth_files))[:: args.stride]

    clouds = []
    for img_path, d_path in frames:
        color = read_image(img_path)
        depth = np.load(d_path)
        h, w = depth.shape
        K = NORMALIZED_K[:3, :3].copy()
        K[0] *= w
        K[1] *= h
        clouds.append(depth_to_pointcloud(color, depth, K))

    try:
        import time

        import viser

        server = viser.ViserServer(port=args.port)
        for i, (pts, cols) in enumerate(clouds):
            server.scene.add_point_cloud(
                f"/frame_{i:04d}", points=pts.astype(np.float32),
                colors=cols.astype(np.uint8), point_size=0.5,
            )
        print(f"viser server on :{args.port} — ctrl-c to stop")
        while True:
            time.sleep(1)
    except ImportError:
        out = args.ply_out or os.path.join(args.pred_root, args.sequence, "ply")
        os.makedirs(out, exist_ok=True)
        for i, (pts, cols) in enumerate(clouds):
            save_pointcloud(os.path.join(out, f"{i:06d}.ply"), pts, cols)
        print(f"viser not installed; exported {len(clouds)} PLY clouds to {out}")


if __name__ == "__main__":
    main()
