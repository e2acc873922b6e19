#!/usr/bin/env bash
# Single-chip video-depth throughput benchmark.
python bench.py
