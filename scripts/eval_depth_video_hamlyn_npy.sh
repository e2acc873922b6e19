#!/usr/bin/env bash
set -e
HAMLYN_DIR=${HAMLYN_DIR:-/data/hamlyn}
PRED_ROOT=${PRED_ROOT:?set PRED_ROOT to the saved depth root}
python evaluate_depth_video_hamlyn.py --data_path "$HAMLYN_DIR" \
    --eval_split hamlyn_video --pred_root "$PRED_ROOT"
