#!/bin/bash
# Instant-NGP baseline on MipNeRF-360 v2 (reference base_360v2.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [bicycle]=16 [bonsai]=16 [counter]=16 [garden]=16 \
                   [kitchen]=4 [room]=4 [stump]=64 )
for SCENE in bicycle bonsai counter garden kitchen room stump; do
python train.py \
    --root_dir $DATA/360_v2/$SCENE --dataset_type 360v2 \
    --dataset_name 360_v2 --exp_name base --scene_name $SCENE \
    --downsample 0.25 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips $EXTRA_ARGS
done
