#!/bin/bash
# Rad-NeRF on Eyeful Tower (reference rad_eyeful.sh).
source "$(dirname "$0")/_common.sh"
for SCENE in apartment office_view2 office1b riverview; do
python train_ml.py \
    --root_dir $DATA/eyeful_tower/$SCENE --dataset_type eyeful \
    --dataset_name eyeful_tower --exp_name ours_size2 --scene_name $SCENE \
    --downsample 1 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale 4 --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 1e-4 --cv_loss_w 1e-2 $EXTRA_ARGS
done
