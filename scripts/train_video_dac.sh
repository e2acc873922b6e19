#!/usr/bin/env bash
# Single-frame EndoDAC training (reference scripts/train_video_dac.sh counterpart).
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
log_dir=${LOG_DIR:-./logs/endodac_tpu}

python train_end_to_end_video.py --data_path "$SCARED_DIR" \
    --model_type endodac --encoder vitb \
    --log_dir "$log_dir" --batch_size 8 --T -1 \
    --lora_type dvlora --warm_up_step 20000
