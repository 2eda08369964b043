#!/bin/bash
# Mega-NeRF-style baseline on ScanNet (reference mega_scannet.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in scene0046_00 scene0276_00 scene0515_00 scene0673_04; do
python train_other.py \
    --root_dir $DATA/scannet/$SCENE --dataset_type scannet \
    --dataset_name scannet --exp_name mega_size2 --scene_name $SCENE \
    --model_type mega --model_zoo_size 2 \
    --downsample 0.5 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale 4 --eval_lpips $EXTRA_ARGS
done
