#!/bin/bash
# Block-NeRF-style baseline on masked TanksAndTemple (reference block_TAT.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in Ignatius Truck Barn Caterpillar Family; do
python train_other.py \
    --root_dir $DATA/TanksAndTemple/$SCENE --dataset_type nsvf \
    --dataset_name TanksAndTemple --exp_name block_size2 --scene_name $SCENE \
    --model_type block --model_zoo_size 2 \
    --downsample 1 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale 0.5 --eval_lpips $EXTRA_ARGS
done
