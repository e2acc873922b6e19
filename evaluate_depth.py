#!/usr/bin/env python
"""Thin wrapper mirroring the reference CLI name; see endodav_tpu/cli/evaluate_depth.py."""
from endodav_tpu.cli.evaluate_depth import main

if __name__ == "__main__":
    main()
