#!/usr/bin/env python
"""GT-depth cross-frame reprojection sanity tool.

Script form of the reference's `tools/reproject_depth.ipynb`: load two
SCARED frames with their GT depths and world-to-camera poses, backproject
the source depth, project it into the target camera, warp the target
image/depth back with a bilinear grid sample, and save a 6-panel figure
(source/target/warped images, source/projected/target-projected depths)
plus an optional PLY of the backprojected cloud.

Uses the framework geometry library (geometry/transforms.py,
ops/sampling.py) instead of torch — the same code paths the training
losses run on, so this doubles as a visual check of the geometry stack.

Usage:
  python tools/reproject_depth.py --data_root <.../dataset1/keyframe1/data> \
      --src_id 0 --tgt_id 100 --out reproject.png [--ply cloud.ply]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help=".../train/datasetN/keyframeM/data directory")
    p.add_argument("--src_id", type=int, default=0)
    p.add_argument("--tgt_id", type=int, default=100)
    p.add_argument("--depth_scale", type=float, default=0.5,
                   help="multiplier applied to raw GT depth (notebook cell 1 halves it)")
    p.add_argument("--out", default="reproject.png")
    p.add_argument("--ply", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from endodav_tpu.data.readers import read_image, read_pose_json, read_scared_depth
    from endodav_tpu.geometry.transforms import backproject_depth, project_3d
    from endodav_tpu.ops.sampling import grid_sample

    import glob

    lefts = sorted(glob.glob(os.path.join(args.data_root, "left", "*.png")))
    depths = sorted(glob.glob(os.path.join(args.data_root, "scene_points", "*.tiff")))
    poses = sorted(glob.glob(os.path.join(args.data_root, "frame_data", "*.json")))

    def load(i):
        img = read_image(lefts[i])
        depth = read_scared_depth(depths[i]) * args.depth_scale
        pose = read_pose_json(poses[i])  # w2c
        return img, depth, pose

    src_img, src_depth, src_pose = load(args.src_id)
    tgt_img, tgt_depth, tgt_pose = load(args.tgt_id)
    h, w = src_depth.shape

    # normalized intrinsics template (data/pipeline.py NORMALIZED_K:
    # fx=0.82W fy=1.02H c=0.5 — scared_video_dataset.py:193-196)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.82 * w, 1.02 * h, 0.5 * w, 0.5 * h
    T = (tgt_pose @ np.linalg.pinv(src_pose)).astype(np.float32)  # src cam -> tgt cam

    cam_points = backproject_depth(jnp.asarray(src_depth)[None], jnp.linalg.inv(jnp.asarray(K))[None])
    pix, src_proj_depth = project_3d(cam_points, jnp.asarray(K)[None], jnp.asarray(T)[None], h, w)
    warped_img = grid_sample(jnp.asarray(tgt_img, jnp.float32)[None], pix)[0]
    tgt_proj_depth = grid_sample(jnp.asarray(tgt_depth)[None, ..., None], pix)[0, ..., 0]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        (src_img, "source image", None),
        (tgt_img, "target image", None),
        (np.asarray(warped_img).astype(np.uint8), "tgt -> src", None),
        (src_depth, "source depth", "jet"),
        (np.asarray(src_proj_depth).reshape(h, w), "source proj depth", "jet"),
        (np.asarray(tgt_proj_depth), "target proj depth", "jet"),
    ]
    plt.figure(figsize=(12, 8))
    for i, (im, title, cmap) in enumerate(panels):
        ax = plt.subplot(2, 3, i + 1)
        m = ax.imshow(im, cmap=cmap)
        if cmap:
            plt.colorbar(m, ax=ax, fraction=0.04)
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")

    if args.ply:
        from endodav_tpu.cli.visualize import save_pointcloud

        pts = np.asarray(cam_points)[0, :3].T  # [N, 3]
        cols = src_img.reshape(-1, 3)
        save_pointcloud(args.ply, pts, cols)
        print(f"wrote {args.ply}")


if __name__ == "__main__":
    main()
