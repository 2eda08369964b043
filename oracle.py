"""Offline evaluation / render harness — twin of the reference oracle.py
(which ends in an ipdb breakpoint, oracle.py:79; this one is finished):
loads a checkpoint, renders a split (`test` or `test_traj`), writes images
and prints mean PSNR/SSIM when ground truth exists.

    python oracle.py --root_dir ... --dataset_type nsvf --split test \
        --ckpt_path ckpts/.../epoch=19.ckpt --moe_training --model_zoo_size 2
"""

import os

import numpy as np

from radnerf_tpu.opt import get_parser
from radnerf_tpu.train.trainer import NeRFSystem


def main(argv=None):
    parser = get_parser()
    # the trainer restricts --split to train splits; the oracle renders
    # eval splits too (reference oracle.py:26 passes it straight through)
    for a in parser._actions:
        if a.dest == "split":
            a.choices = [
                "train", "trainval", "trainvaltest", "val", "test",
                "test_traj",
            ]
    parser.set_defaults(split="test")  # the split to RENDER
    hparams = parser.parse_args(argv)
    if not hparams.ckpt_path and not hparams.weight_path:
        raise ValueError("provide --ckpt_path or --weight_path")
    hparams.no_save_test = False
    render_split = hparams.split
    # the trainer's device-resident ray store always loads the train split;
    # --split only selects what gets rendered below
    hparams.split = "train"
    system = NeRFSystem(hparams)
    system.setup()
    if hparams.ckpt_path:
        system.resume(hparams.ckpt_path)
    if render_split != "test":
        from radnerf_tpu.data import dataset_dict

        system.test_dataset = dataset_dict[hparams.dataset_type](
            root_dir=hparams.root_dir, split=render_split,
            downsample=hparams.downsample,
        )
    metrics = system.validate(epoch=0)
    if metrics["psnr"] is not None:
        print(f"PSNR: {metrics['psnr']:.3f}  SSIM: {metrics['ssim']:.4f}")
    print(f"renders written to {system.val_dir}")


if __name__ == "__main__":
    main()
