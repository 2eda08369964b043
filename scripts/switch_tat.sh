#!/bin/bash
# Switch-NeRF-style baseline (reference switch_tat.sh -> train_other.py).
source "$(dirname "$0")/_common.sh"
for SCENE in Ignatius Truck Barn Caterpillar Family; do
python train_other.py \
    --root_dir $DATA/TanksAndTemple/$SCENE --dataset_type nsvf \
    --dataset_name TanksAndTemple --exp_name switch_size2 --scene_name $SCENE \
    --model_type switch --model_zoo_size 2 --gate_type point \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 0.5 --eval_lpips \
    --cv_loss_w 1e-4 $EXTRA_ARGS
done
