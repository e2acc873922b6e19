#!/usr/bin/env bash
# endodac pre_norm / no-ResBottleneck eval (reference scripts/train_video_dac2.sh;
# its training block is commented out upstream too).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
model_type=endodac
log_dir=${LOG_DIR:-./logs/nores-randomtrain}
model_dir=$log_dir/$model_type/models/weights_9

python evaluate_depth_video_pose.py --model_type $model_type \
    --data_path "$SCARED_DIR" --eval_split scared_video \
    --load_weights_folder "$model_dir" --eval_mono --visualize_depth --pre_norm \
    --disable_residual_block
