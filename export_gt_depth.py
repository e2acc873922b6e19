#!/usr/bin/env python
"""Thin wrapper; see endodav_tpu/cli/export_gt.py."""
import sys
from endodav_tpu.cli.export_gt import main

if __name__ == "__main__":
    sys.argv.extend(["--what", "depth"])
    main()
