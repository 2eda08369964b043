#!/bin/bash
# block-NeRF-style baseline on MipNeRF-360 v2 (reference block_360v2.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [bicycle]=32 [bonsai]=8 [counter]=4 [garden]=8 \
                   [kitchen]=8 [room]=16 [stump]=32 )
for SCENE in bicycle bonsai counter garden kitchen room stump; do
python train_other.py \
    --root_dir $DATA/360_v2/$SCENE --dataset_type 360v2 \
    --dataset_name 360_v2 --exp_name block_size2 --scene_name $SCENE \
    --model_type block --model_zoo_size 2 \
    --downsample 0.25 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips $EXTRA_ARGS
done
