#!/bin/bash
# Instant-NGP baseline on ScanNet (reference base_scannet.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [scene0046_00]=4 [scene0276_00]=4 [scene0515_00]=4 \
                   [scene0673_04]=8 )
for SCENE in scene0046_00 scene0276_00 scene0515_00 scene0673_04; do
python train.py \
    --root_dir $DATA/scannet/$SCENE --dataset_type scannet \
    --dataset_name scannet --exp_name base --scene_name $SCENE \
    --downsample 0.5 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips $EXTRA_ARGS
done
