#!/bin/bash
# Instant-NGP few-shot baseline on LLFF (reference base_llff.sh — shipped
# fully commented out there; per-scene scales taken from its comments).
source "$(dirname "$0")/_common.sh"
declare -A SCALE=( [flower]=4 [fortress]=16 [horns]=4 [leaves]=4 \
                   [fern]=4 [orchids]=4 [room]=4 [trex]=4 )
for SCENE in fern flower fortress horns leaves orchids room trex; do
python train.py \
    --root_dir $DATA/llff/$SCENE --dataset_type colmap \
    --dataset_name llff --exp_name base_6views --scene_name $SCENE \
    --downsample 0.25 --num_epochs 10 --batch_size 8192 --lr 1e-2 \
    --scale ${SCALE[$SCENE]} --eval_lpips --num_view 6 $EXTRA_ARGS
done
