#!/bin/bash
# Rad-NeRF on the Free dataset (reference rad_free.sh; depth_mutual 0 here).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [grass]=16 [hydrant]=64 [lab]=16 [pillar]=64 \
                   [road]=16 [sky]=16 [stair]=64 )
for SCENE in grass hydrant lab pillar road sky stair; do
python train_ml.py \
    --root_dir $DATA/free_dataset/$SCENE --dataset_type colmap \
    --dataset_name free_dataset --exp_name rad_size2 --scene_name $SCENE \
    --downsample 0.5 --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 0 --cv_loss_w 1e-2 $EXTRA_ARGS
done
