"""Replica loader (twin of datasets/replica.py; NOTE the reference's loader
is dead code — its constructor passes 4 args to the 3-arg base
(replica.py:15, SURVEY.md §8 quirk 4). We fix the signature and keep the
rest of its semantics: transforms.json intrinsics, images/poses dirs,
alternating train/test split, traj.txt test trajectory)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from .base import BaseDataset
from .color_utils import read_image
from .ray_utils import get_ray_directions


class ReplicaDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0,
                 load_depth=False, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.load_depth = load_depth
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split)

    def read_intrinsics(self):
        with open(os.path.join(self.root_dir, "transforms.json")) as fp:
            metas = json.load(fp)
        ds = self.downsample
        w, h = int(metas["w"] * ds), int(metas["h"] * ds)
        fx, fy = metas["fl_x"] * ds, metas["fl_y"] * ds
        self.K = np.float32([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        self.directions = get_ray_directions(h, w, self.K).astype(np.float32)
        self.img_wh = (w, h)

    def read_meta(self, split):
        all_img_paths = sorted(
            glob.glob(os.path.join(self.root_dir, "images", "*.jpg"))
        )
        all_pose_paths = sorted(
            glob.glob(os.path.join(self.root_dir, "poses", "*.txt"))
        )
        poses, rays = [], []
        for img_path, pose_path in zip(all_img_paths, all_pose_paths):
            c2w = np.loadtxt(pose_path)[:3]
            if np.isinf(c2w).sum() == 0:
                poses.append(c2w)
                rays.append(read_image(img_path, self.img_wh))
        self.rays = np.stack(rays).astype(np.float32)
        poses = np.stack(poses)

        if split == "train":
            ind = [i for i in range(len(poses)) if i % 2 == 0]
            poses, self.rays = poses[ind], self.rays[ind]
        elif split == "test":
            ind = [i for i in range(len(poses)) if i % 2 != 0]
            poses, self.rays = poses[ind], self.rays[ind]
        elif split == "test_traj":
            poses = np.loadtxt(
                os.path.join(self.root_dir, "traj.txt")
            ).reshape(-1, 4, 4)[:, :3]
        self.poses = poses.astype(np.float32)
