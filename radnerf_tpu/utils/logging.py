"""Observability: singleton file logger + TensorBoard metric writer.

Twin of the reference's three channels (SURVEY.md §5): TensorBoardLogger,
singleton file logger (utils/util.py:47-94), and validation image dumps
(handled by the trainer). Metric names match the reference (`train/loss`,
`train/psnr`, `test/psnr`, `test/ssim`, `test/lpips_vgg`, `lr`) for
side-by-side comparability.
"""

from __future__ import annotations

import logging
import os

_GLOBAL_LOGGER: logging.Logger | None = None


def init_global_logger(log_path: str) -> logging.Logger:
    """File+console logger singleton (utils/util.py:47-94)."""
    global _GLOBAL_LOGGER
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    logger = logging.getLogger("radnerf_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", "%Y-%m-%d %H:%M:%S"
    )
    fh = logging.FileHandler(log_path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    _GLOBAL_LOGGER = logger
    return logger


def get_global_logger() -> logging.Logger:
    if _GLOBAL_LOGGER is None:
        return init_global_logger("logs/default/log.txt")
    return _GLOBAL_LOGGER


class MetricWriter:
    """TensorBoard writer (graceful no-op if tensorboard is unavailable),
    plus a jsonl mirror that survives environments without TB."""

    def __init__(self, log_dir: str):
        self.logdir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        import json

        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": step})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
