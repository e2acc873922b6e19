#!/usr/bin/env bash
# Single-frame endodac training, conv_head disabled (reference scripts/train_video_dac1.sh).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
model_type=endodac
log_dir=${LOG_DIR:-./logs/disable_conv_head-dac}
model_dir=$log_dir/$model_type/models/weights_last

python train_end_to_end_video.py --data_path "$SCARED_DIR" \
    --model_type $model_type --num_workers 8 \
    --log_dir "$log_dir" \
    --disable_conv_head \
    --batch_size 16 --T 1 --encoder vits --visualize_depth

python evaluate_depth_video_pose.py --model_type $model_type \
    --data_path "$SCARED_DIR" --eval_split scared_video \
    --load_weights_folder "$model_dir" --eval_mono --visualize_depth
