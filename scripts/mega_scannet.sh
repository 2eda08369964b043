#!/bin/bash
source "$(dirname "$0")/_common.sh"
for SCENE in scene0046 scene0276; do
python train_other.py \
    --root_dir $DATA/scannet/$SCENE --dataset_type scannet \
    --dataset_name scannet --exp_name mega --scene_name $SCENE \
    --model_type mega --model_zoo_size 2 --overlap_ratio 0.25 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 0.5 --eval_lpips \
    $EXTRA_ARGS
done
