"""Rad-NeRF MoE training entry — twin of the reference train_ml.py.

Example (headline TAT config, scripts/rad_TAT.sh):
    python train_ml.py --root_dir .../Ignatius --dataset_type nsvf \
        --dataset_name TanksAndTemple --scene_name Ignatius \
        --exp_name rad --num_epochs 20 --batch_size 8192 --lr 1e-2 \
        --scale 0.5 --moe_training --model_zoo_size 2 --gate_type ray \
        --depth_mutual_loss_w 5e-3 --cv_loss_w 1e-2
"""

from radnerf_tpu.opt import get_opts
from radnerf_tpu.train.trainer import NeRFSystem


def main():
    hparams = get_opts()
    if hparams.val_only and not hparams.ckpt_path:
        raise ValueError("You need to provide a @ckpt_path for validation!")
    hparams.moe_training = True  # this entry is the canonical MoE path
    system = NeRFSystem(hparams)
    system.setup()
    if hparams.ckpt_path:
        system.resume(hparams.ckpt_path)
    elif getattr(hparams, "resume", None) == "auto":
        system.auto_resume()
    if hparams.val_only:
        system.validate(epoch=0)
    else:
        system.fit()


if __name__ == "__main__":
    main()
