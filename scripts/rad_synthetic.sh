#!/bin/bash
# Rad-NeRF on NeRF-synthetic (reference rad_synthetic.sh: batch 16384, lr 2e-2).
source "$(dirname "$0")/_common.sh"
for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
python train_ml.py \
    --root_dir $DATA/Synthetic_NeRF/$SCENE --dataset_type nsvf \
    --dataset_name Synthetic_NeRF --exp_name rad_size2 \
    --scene_name $SCENE --downsample 1 \
    --num_epochs 20 --batch_size 16384 --lr 2e-2 --scale 0.5 --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 0.005 --cv_loss_w 1e-2 $EXTRA_ARGS
done
