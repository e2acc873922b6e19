#!/usr/bin/env bash
# ssb-LoRA variant with depth_reproj 1e-4 (reference scripts/train_video1.sh).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
model_type=endodav
log_dir=${LOG_DIR:-./logs/lorassb-dr1e-4}
model_dir=$log_dir/$model_type/models/weights_last

python train_end_to_end_video.py --data_path "$SCARED_DIR" \
    --model_type $model_type --num_workers 4 \
    --log_dir "$log_dir" \
    --batch_size 1 --T 16 --encoder vits \
    --disable_residual_block --disable_conv_head \
    --lora_type ssb --warm_up_step 200000 \
    --visualize_depth \
    --depth_reproj 1e-4 \
    --temporal_lora --tune_spatial_interval 400 --tune_temporal_interval 100

python evaluate_depth_video_pose.py --model_type $model_type \
    --data_path "$SCARED_DIR" --eval_split scared_video \
    --load_weights_folder "$model_dir" --eval_mono --visualize_depth \
    --disable_residual_block --disable_conv_head
