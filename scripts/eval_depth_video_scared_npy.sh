#!/usr/bin/env bash
# Re-evaluate pre-saved npy depth dirs without running a model.
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
PRED_ROOT=${PRED_ROOT:?set PRED_ROOT to the saved depth root}
python evaluate_depth_video.py --data_path "$SCARED_DIR" \
    --eval_split scared_video --pred_root "$PRED_ROOT"
