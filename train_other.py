"""Block/Mega/Switch-NeRF baseline training entry.

Reconstruction of the reference's gitignored train_other.py (referenced by
scripts/block_*.sh, mega_*.sh, switch_*.sh — SURVEY.md §8 quirk 6).

Example (scripts/switch_tat.sh style):
    python train_other.py --root_dir .../Ignatius --dataset_type nsvf \
        --model_type switch --model_zoo_size 2 --gate_type point \
        --scale 0.5 --num_epochs 20 --cv_loss_w 1e-2
"""

from radnerf_tpu.opt import get_opts
from radnerf_tpu.train.other_trainer import OtherNeRFSystem


def main():
    hparams = get_opts()
    assert hparams.model_type in ("switch", "block", "mega"), (
        f"--model_type must be switch|block|mega, got {hparams.model_type}"
    )
    system = OtherNeRFSystem(hparams)
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
