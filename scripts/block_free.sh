#!/bin/bash
# block-NeRF-style baseline on the Free dataset (reference block_free.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [grass]=16 [hydrant]=64 [lab]=16 [pillar]=64 \
                   [road]=16 [sky]=16 [stair]=64 )
declare -A BATCH=( [grass]=4096 [hydrant]=4096 [lab]=8192 [pillar]=4096 \
                   [road]=8192 [sky]=8192 [stair]=4096 )
for SCENE in grass hydrant lab pillar road sky stair; do
python train_other.py \
    --root_dir $DATA/free_dataset/$SCENE --dataset_type colmap \
    --dataset_name free_dataset --exp_name block_size2 --scene_name $SCENE \
    --model_type block --model_zoo_size 2 \
    --downsample 0.5 --num_epochs 20 --batch_size ${BATCH[$SCENE]} \
    --lr 1e-2 --scale ${SCALE[$SCENE]} --eval_lpips $EXTRA_ARGS
done
