#!/usr/bin/env python
"""Thin wrapper (the reference's evaluate_pose_video.py is byte-identical
to evaluate_pose.py); see endodav_tpu/cli/evaluate_pose.py."""
from endodav_tpu.cli.evaluate_pose import main

if __name__ == "__main__":
    main()
