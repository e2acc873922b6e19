#!/usr/bin/env bash
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
HAMLYN_DIR=${HAMLYN_DIR:-/data/hamlyn}
model_dir=${MODEL_DIR:?set MODEL_DIR to a weights folder}

python evaluate_depth_video_pose.py --model_type endodav \
    --data_path "$SCARED_DIR" --eval_split scared_video \
    --load_weights_folder "$model_dir" --eval_mono

python evaluate_depth_video_hamlyn.py --model_type endodav \
    --data_path "$HAMLYN_DIR" --eval_split hamlyn_video \
    --load_weights_folder "$model_dir" --eval_mono
