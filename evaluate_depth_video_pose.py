#!/usr/bin/env python
"""Thin wrapper mirroring the reference CLI name; see endodav_tpu/cli/evaluate_depth_video_pose.py."""
from endodav_tpu.cli.evaluate_depth_video_pose import main

if __name__ == "__main__":
    main()
