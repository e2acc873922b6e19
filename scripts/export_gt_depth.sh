#!/usr/bin/env bash
# Pack GT depth tiffs into splits/<split>/gt_depths.npz
# (reference scripts/export_gt_depth.sh).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}

python export_gt_depth.py \
    --data_path "$SCARED_DIR" \
    --split endovis_video \
    --useage eval
