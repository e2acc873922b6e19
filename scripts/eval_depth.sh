#!/usr/bin/env bash
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
model_dir=${MODEL_DIR:?set MODEL_DIR to a weights folder}
python evaluate_depth.py --data_path "$SCARED_DIR" --eval_split endovis \
    --model_type endodac --load_weights_folder "$model_dir" --eval_mono
