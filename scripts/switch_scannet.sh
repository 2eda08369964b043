#!/bin/bash
# Switch-NeRF-style baseline on ScanNet (reference switch_scannet.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in scene0046_00 scene0276_00 scene0515_00 scene0673_04; do
python train_other.py \
    --root_dir $DATA/scannet/$SCENE --dataset_type scannet \
    --dataset_name scannet --exp_name switch_size2 --scene_name $SCENE \
    --model_type switch --model_zoo_size 2 --gate_type point \
    --downsample 0.5 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale 4 --eval_lpips --cv_loss_w 1e-4 $EXTRA_ARGS
done
