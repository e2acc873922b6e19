#!/usr/bin/env bash
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
python -m endodav_tpu.cli.export_gt --data_path "$SCARED_DIR" --what both
