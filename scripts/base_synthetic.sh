#!/bin/bash
source "$(dirname "$0")/_common.sh"
for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
python train.py \
    --root_dir $DATA/Synthetic_NeRF/$SCENE --dataset_type nsvf \
    --dataset_name Synthetic_NeRF --exp_name base \
    --scene_name $SCENE --downsample 1 \
    --num_epochs 20 --batch_size 16384 --lr 2e-2 --scale 0.5 --eval_lpips \
    $EXTRA_ARGS
done
