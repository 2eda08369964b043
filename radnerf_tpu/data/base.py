"""Dataset base class.

Twin of datasets/base.py: a training "epoch" is 1000 virtual batches
(base.py:19-21); each batch is `batch_size` random (image, pixel) pairs and
batching lives inside the dataset (DataLoader(batch_size=None) in the
reference). Here `sample_batch` returns numpy indices; the trainer keeps the
full ray store device-resident and gathers on device, so there is no
host->device traffic per step beyond the indices.
"""

from __future__ import annotations

import numpy as np


class BaseDataset:
    """Subclasses must set: poses (M, 3, 4) f32, directions (H*W, 3) f32,
    rays (M, H*W, C) f32 (rgb [+extras]), img_wh (W, H), K (3, 3)."""

    STEPS_PER_EPOCH = 1000  # base.py:19-21

    def __init__(self, root_dir: str, split: str = "train",
                 downsample: float = 1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        self.batch_size = 8192
        self.rays = np.zeros((0, 0, 3), np.float32)
        self.rng = np.random.default_rng(42)

    def read_intrinsics(self):
        raise NotImplementedError

    def __len__(self):
        if self.split.startswith("train"):
            return self.STEPS_PER_EPOCH
        return len(self.poses)

    def sample_batch(self, rng: np.random.Generator | None = None) -> dict:
        """Random (img, pix) pairs for one training batch (base.py:23-30)."""
        rng = rng or self.rng
        img_idxs = rng.integers(0, len(self.poses), self.batch_size)
        pix_idxs = rng.integers(
            0, self.img_wh[0] * self.img_wh[1], self.batch_size
        )
        rays = self.rays[img_idxs, pix_idxs]
        return {"img_idxs": img_idxs, "pix_idxs": pix_idxs, "rays": rays}

    def __getitem__(self, idx: int) -> dict:
        if self.split.startswith("train"):
            return self.sample_batch()
        sample = {"pose": self.poses[idx], "img_idxs": idx}
        if len(self.rays) > 0:
            sample["rgb"] = self.rays[idx][:, :3]
        return sample
