#!/usr/bin/env python
"""Thin wrapper mirroring the reference CLI name; see endodav_tpu/cli/test_simple.py."""
from endodav_tpu.cli.test_simple import main

if __name__ == "__main__":
    main()
