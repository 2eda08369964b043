"""NeRF++ layout loader (twin of datasets/nerfpp.py): train/val/test dirs
with rgb/, pose/, intrinsics/ subfolders + camera_path trajectory. Used for
unmasked Tanks&Temples intermediate scenes (scripts/rad_tat.sh)."""

from __future__ import annotations

import glob
import os

import numpy as np

from .base import BaseDataset
from .color_utils import read_image
from .ray_utils import get_ray_directions


class NeRFPPDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split, **kwargs)

    def read_intrinsics(self):
        from PIL import Image

        K = np.loadtxt(
            sorted(
                glob.glob(os.path.join(self.root_dir, "train/intrinsics/*.txt"))
            )[0],
            dtype=np.float32,
        ).reshape(4, 4)[:3, :3]
        K[:2] *= self.downsample
        w, h = Image.open(
            sorted(glob.glob(os.path.join(self.root_dir, "train/rgb/*")))[0]
        ).size
        w, h = int(w * self.downsample), int(h * self.downsample)
        self.K = K
        self.directions = get_ray_directions(h, w, K).astype(np.float32)
        self.img_wh = (w, h)

    def read_meta(self, split, **kwargs):
        poses, rays = [], []
        if split == "test_traj":
            pose_paths = sorted(
                glob.glob(os.path.join(self.root_dir, "camera_path/pose/*.txt"))
            )
            poses = [np.loadtxt(p).reshape(4, 4)[:3] for p in pose_paths]
        else:
            if split == "trainval":
                img_paths, pose_paths = [], []
                for s in ("train", "val"):
                    img_paths += sorted(
                        glob.glob(os.path.join(self.root_dir, s, "rgb/*"))
                    )
                    pose_paths += sorted(
                        glob.glob(os.path.join(self.root_dir, s, "pose/*.txt"))
                    )
            else:
                img_paths = sorted(
                    glob.glob(os.path.join(self.root_dir, split, "rgb/*"))
                )
                pose_paths = sorted(
                    glob.glob(os.path.join(self.root_dir, split, "pose/*.txt"))
                )
            for img_path, pose_path in zip(img_paths, pose_paths):
                poses.append(np.loadtxt(pose_path).reshape(4, 4)[:3])
                rays.append(read_image(img_path, self.img_wh))
            self.rays = np.stack(rays).astype(np.float32)
        self.poses = np.stack(poses).astype(np.float32)
