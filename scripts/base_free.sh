#!/bin/bash
# Instant-NGP baseline on the Free dataset (reference base_free.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [grass]=16 [hydrant]=64 [lab]=16 [pillar]=64 \
                   [road]=16 [sky]=16 [stair]=64 )
for SCENE in grass hydrant lab pillar road sky stair; do
python train.py \
    --root_dir $DATA/free_dataset/$SCENE --dataset_type colmap \
    --dataset_name free_dataset --exp_name base --scene_name $SCENE \
    --downsample 0.5 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips $EXTRA_ARGS
done
