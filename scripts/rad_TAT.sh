#!/bin/bash
# Rad-NeRF headline config on masked Tanks&Temples (reference rad_TAT.sh:
# zoo size 5; use ZOO=2 for the size-2 headline of README.md:88-92).
source "$(dirname "$0")/_common.sh"
ZOO=${ZOO:-5}
for SCENE in Ignatius Truck Barn Caterpillar Family; do
python train_ml.py \
    --root_dir $DATA/TanksAndTemple/$SCENE --dataset_type nsvf \
    --dataset_name TanksAndTemple --exp_name rad_size$ZOO \
    --scene_name $SCENE --downsample 1 \
    --num_epochs 20 --batch_size 8192 --lr 1e-2 --scale 0.5 --eval_lpips \
    --moe_training --model_zoo_size $ZOO --gate_type ray \
    --depth_mutual_loss_w 5e-3 --cv_loss_w 1e-2 $EXTRA_ARGS
done
