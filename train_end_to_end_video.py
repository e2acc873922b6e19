#!/usr/bin/env python
"""Thin wrapper mirroring the reference CLI name; see endodav_tpu/cli/train_end_to_end_video.py."""
from endodav_tpu.cli.train_end_to_end_video import main

if __name__ == "__main__":
    main()
