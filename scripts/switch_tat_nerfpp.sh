#!/bin/bash
# Switch-NeRF-style baseline on TAT intermediate (reference switch_tat.sh).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [M60]=4 [Playground]=8 [Train]=32 [Truck]=16 )
for SCENE in M60 Playground Train Truck; do
python train_other.py \
    --root_dir $DATA/tanks_and_temples/tat_intermediate_$SCENE \
    --dataset_type nerfpp --dataset_name tanks_and_temples \
    --exp_name switch_size2 --scene_name $SCENE --downsample 1 \
    --model_type switch --model_zoo_size 2 --gate_type point \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips --cv_loss_w 1e-4 $EXTRA_ARGS
done
