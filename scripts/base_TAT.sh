#!/bin/bash
# Instant-NGP baseline on masked TAT (reference base_TAT.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in Ignatius Truck Barn Caterpillar Family; do
python train.py \
    --root_dir $DATA/TanksAndTemple/$SCENE --dataset_type nsvf \
    --dataset_name TanksAndTemple --exp_name base \
    --scene_name $SCENE --downsample 1 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 0.5 --eval_lpips \
    $EXTRA_ARGS
done
