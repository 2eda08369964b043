#!/bin/bash
# Instant-NGP baseline on Eyeful Tower (reference base_eyeful.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in apartment office_view2 office1b riverview; do
python train.py \
    --root_dir $DATA/eyeful_tower/$SCENE --dataset_type eyeful \
    --dataset_name eyeful_tower --exp_name base --scene_name $SCENE \
    --downsample 1 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale 4 --eval_lpips $EXTRA_ARGS
done
