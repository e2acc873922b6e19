#!/usr/bin/env bash
# Hamlyn eval of the ssb-LoRA endodav run (reference scripts/eval_depth_video1.sh).
set -e
HAMLYN_DIR=${HAMLYN_DIR:-/data/hamlyn}
model_type=endodav
log_dir=${LOG_DIR:-./logs/lorassb-dr1e-4}
model_dir=$log_dir/$model_type/models/weights_2

python evaluate_depth_video_hamlyn.py --model_type $model_type \
    --data_path "$HAMLYN_DIR" --eval_split hamlyn_video \
    --load_weights_folder "$model_dir" --eval_mono --visualize_depth \
    --disable_residual_block --disable_conv_head --lora_type=ssb
