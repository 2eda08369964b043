#!/bin/bash
# Few-shot LLFF (reference rad_llff.sh: --num_view 6).
source "$(dirname "$0")/_common.sh"
for SCENE in fern flower fortress horns leaves orchids room trex; do
python train_ml.py \
    --root_dir $DATA/nerf_llff_data/$SCENE --dataset_type colmap \
    --dataset_name llff --exp_name rad_fewshot --scene_name $SCENE \
    --downsample 0.25 --num_view 6 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 4 --eval_lpips \
    --moe_training --model_zoo_size 2 --gate_type ray \
    --depth_mutual_loss_w 5e-3 --cv_loss_w 1e-2 $EXTRA_ARGS
done
