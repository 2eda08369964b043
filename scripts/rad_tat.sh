#!/bin/bash
# Rad-NeRF on unmasked TAT intermediate (reference rad_tat.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [M60]=4 [Playground]=8 [Train]=32 [Truck]=16 )
for SCENE in M60 Playground Train Truck; do
python train_ml.py \
    --root_dir $DATA/tanks_and_temples/tat_intermediate_$SCENE \
    --dataset_type nerfpp --dataset_name tanks_and_temples \
    --exp_name rad_size2 --scene_name $SCENE --downsample 1 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 5e-3 --cv_loss_w 1e-2 $EXTRA_ARGS
done
