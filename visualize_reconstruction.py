#!/usr/bin/env python
"""Thin wrapper; see endodav_tpu/cli/visualize.py."""
import sys
from endodav_tpu.cli.visualize import main

if __name__ == "__main__":
    sys.argv.extend(["--mode", "reconstruction"])
    main()
