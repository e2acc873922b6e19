#!/usr/bin/env bash
# Mesh data-parallel training (reference scripts/train_dp.sh counterpart).
# The reference wraps every sub-model in torch DataParallel over
# CUDA_VISIBLE_DEVICES; here the jitted train step shards the batch over a
# jax device mesh — pass --mesh_shape data=N to restrict the axis, or
# leave it empty to use every visible chip.
set -e
SCARED_DIR=${SCARED_DIR:-/data/scared}
MESH=${MESH:-}   # e.g. data=8

python train_end_to_end_video.py --data_path "$SCARED_DIR" \
    --log_dir ./logs/dp --use_dp ${MESH:+--mesh_shape "$MESH"}
