#!/bin/bash
source "$(dirname "$0")/_common.sh"
for SCENE in scene0046 scene0276; do
python train_ml.py \
    --root_dir $DATA/scannet/$SCENE --dataset_type scannet \
    --dataset_name scannet --exp_name rad_size2 --scene_name $SCENE \
    --downsample 0.5 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 0.5 --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 5e-3 --cv_loss_w 1e-2 $EXTRA_ARGS
done
