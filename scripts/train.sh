#!/usr/bin/env bash
# Frame-based endodac training on the endovis split (reference scripts/train.sh).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
python train_end_to_end_video.py --data_path "$SCARED_DIR" \
    --model_type endodac --split endovis --batch_size 8 --T -1
