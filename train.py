"""Instant-NGP single-field training entry — twin of the reference train.py.

NOTE: the reference's --moe_training branch in train.py is bit-rotted
(Ray_Gate called with nonexistent kwargs, train.py:79-81 — SURVEY.md §8
quirk 1); the canonical MoE entry is train_ml.py. Here --moe_training
delegates to the working MoE system.
"""

from radnerf_tpu.opt import get_opts
from radnerf_tpu.train.trainer import NeRFSystem


def main():
    hparams = get_opts()
    if hparams.val_only and not hparams.ckpt_path:
        raise ValueError("You need to provide a @ckpt_path for validation!")
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
