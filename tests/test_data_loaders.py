"""Every dataset loader executed against tiny synthetic on-disk fixtures.

VERDICT round-2 gap: 10 of 16 data modules had never parsed a byte. Each
test writes a minimal scene in the loader's native on-disk format (COLMAP
binary model, NeRF++ dirs, ScanNet intrinsics/poses, Replica, Mill19 .pt,
Eyeful cameras.json, RTMV json, PFM) and asserts poses/rays/directions
shapes and finiteness — the same contract the trainer consumes
(reference: datasets/*.py)."""

import json
import os
import struct

import numpy as np
import pytest

from radnerf_tpu.data import dataset_dict
from radnerf_tpu.data.ray_utils import get_rays

imageio = pytest.importorskip("imageio.v2")

W0, H0 = 40, 30   # source image size written to disk


def _write_img(path, w=W0, h=H0, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    imageio.imwrite(path, img)


def _circle_pose(i, n, radius=4.0):
    """c2w (3, 4) of a camera on a circle looking at the origin."""
    a = 2 * np.pi * i / n
    eye = np.array([radius * np.cos(a), radius * np.sin(a), 1.5])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=1)  # cols: x right, y down, z fwd
    return np.concatenate([R, eye[:, None]], axis=1)


def _check(ds, n_imgs, with_rays=True):
    w, h = ds.img_wh
    assert ds.poses.shape == (n_imgs, 3, 4)
    assert ds.poses.dtype == np.float32
    assert np.isfinite(ds.poses).all()
    assert ds.directions.shape == (w * h, 3)
    if with_rays:
        assert ds.rays.shape == (n_imgs, w * h, 3)
        assert np.isfinite(ds.rays).all()
        assert 0.0 <= ds.rays.min() and ds.rays.max() <= 1.0
    ro, rd = get_rays(ds.directions, ds.poses[0])
    assert ro.shape == (w * h, 3) and rd.shape == (w * h, 3)
    assert np.isfinite(rd).all()


# --------------------------------------------------------------- colmap --
def _write_colmap_model(root, n_imgs=10, n_pts=40):
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, W0, H0))
        f.write(struct.pack("<3d", 35.0, W0 / 2, H0 / 2))
    from radnerf_tpu.data.colmap_utils import rotmat2qvec

    # images.bin + image files
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            c2w = np.concatenate(
                [_circle_pose(i, n_imgs), [[0, 0, 0, 1]]], axis=0
            )
            w2c = np.linalg.inv(c2w)
            q = rotmat2qvec(w2c[:3, :3])
            name = f"im{i:02d}.png"
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *w2c[:3, 3]))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # 2 observed 2D points
            for _ in range(2):
                f.write(struct.pack("<ddq", 1.0, 2.0, 1))
            _write_img(os.path.join(root, "images", name), seed=i)
    # points3D.bin: cluster near origin, each seen by 3 images
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for p in range(n_pts):
            xyz = rng.normal(0, 0.5, 3)
            f.write(struct.pack("<Q", p + 1))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", 100, 120, 140))
            f.write(struct.pack("<d", 0.5))
            track = [(1 + (p + k) % n_imgs, 0) for k in range(3)]
            f.write(struct.pack("<Q", len(track)))
            for iid, pidx in track:
                f.write(struct.pack("<ii", iid, pidx))


def test_colmap(tmp_path):
    root = str(tmp_path / "scene")
    _write_colmap_model(root)
    ds = dataset_dict["colmap"](root, split="train")
    _check(ds, 8)  # 10 images, every 8th (indices 0, 8) held out
    # normalization: min camera distance == 1 after scaling
    assert np.isclose(
        np.linalg.norm(ds.poses[..., 3], axis=-1).min(), 1.0, atol=0.3
    )
    assert ds.bbox.shape == (2, 3)
    ds_test = dataset_dict["colmap"](root, split="test")
    _check(ds_test, 2)
    # few-shot --num_view (colmap.py:115-120)
    ds_few = dataset_dict["colmap"](root, split="train", num_view=3)
    _check(ds_few, 3)


def test_nerf360v2(tmp_path):
    root = str(tmp_path / "360_v2_scene")
    _write_colmap_model(root)
    # pre-downsampled folder images_2 for downsample=0.5
    for i in range(10):
        _write_img(
            os.path.join(root, "images_2", f"im{i:02d}.png"),
            W0 // 2, H0 // 2, seed=i,
        )
    ds = dataset_dict["360v2"](root, split="train", downsample=0.5)
    assert ds.img_wh == (W0 // 2, H0 // 2)
    _check(ds, 8)
    # 360v2 test_traj: spheric poses (colmap.py:99-105)
    tr = dataset_dict["360v2"](root, split="test_traj", downsample=0.5)
    assert tr.poses.shape[1:] == (3, 4)
    assert len(tr.poses) > 0


# --------------------------------------------------------------- nerfpp --
def test_nerfpp(tmp_path):
    root = str(tmp_path / "tat")
    for s, n in (("train", 5), ("val", 2), ("test", 3)):
        for i in range(n):
            _write_img(os.path.join(root, s, "rgb", f"{i:05d}.png"), seed=i)
            os.makedirs(os.path.join(root, s, "pose"), exist_ok=True)
            c2w = np.concatenate(
                [_circle_pose(i, n), [[0, 0, 0, 1]]], axis=0
            )
            np.savetxt(os.path.join(root, s, "pose", f"{i:05d}.txt"),
                       c2w.reshape(-1))
    K = np.array([[35.0, 0, W0 / 2, 0], [0, 35.0, H0 / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    os.makedirs(os.path.join(root, "train/intrinsics"), exist_ok=True)
    np.savetxt(os.path.join(root, "train/intrinsics/00000.txt"),
               K.reshape(-1))
    os.makedirs(os.path.join(root, "camera_path/pose"), exist_ok=True)
    for i in range(4):
        c2w = np.concatenate([_circle_pose(i, 4), [[0, 0, 0, 1]]], axis=0)
        np.savetxt(os.path.join(root, "camera_path/pose", f"{i:05d}.txt"),
                   c2w.reshape(-1))

    _check(dataset_dict["nerfpp"](root, split="train"), 5)
    _check(dataset_dict["nerfpp"](root, split="trainval"), 7)
    tr = dataset_dict["nerfpp"](root, split="test_traj")
    assert tr.poses.shape == (4, 3, 4)


# -------------------------------------------------------------- scannet --
def test_scannet(tmp_path):
    root = str(tmp_path / "scan")
    os.makedirs(root, exist_ok=True)
    np.savetxt(
        os.path.join(root, "intrinsics.txt"),
        np.array([[35.0, 0, W0 / 2, 0], [0, 35.0, H0 / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]]),
    )
    n = 18
    for i in range(n):
        _write_img(os.path.join(root, "images", f"{i:04d}.jpg"),
                   w=128, h=96, seed=i)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        c2w = np.concatenate([_circle_pose(i, n), [[0, 0, 0, 1]]], axis=0)
        if i == 3:  # invalid tracked pose -> dropped (scannet semantics)
            c2w[:3] = np.inf
        np.savetxt(os.path.join(root, "poses", f"{i:04d}.txt"), c2w)
    ds = dataset_dict["scannet"](root, split="train", downsample=0.05)
    w, h = ds.img_wh
    assert (w, h) == (int(1296 * 0.05), int(968 * 0.05))
    # 18 written, 1 inf-dropped -> 17 valid; every 16th (0, 16) held out
    _check(ds, 15)
    # poses cube-normalized into [-0.5, 0.5]
    assert np.abs(ds.poses[..., 3]).max() <= 0.5 + 1e-6
    ds_t = dataset_dict["scannet"](root, split="test", downsample=0.05)
    _check(ds_t, 2)


# -------------------------------------------------------------- replica --
def test_replica(tmp_path):
    root = str(tmp_path / "replica")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"w": W0, "h": H0, "fl_x": 35.0, "fl_y": 35.0}, f)
    n = 8
    for i in range(n):
        _write_img(os.path.join(root, "images", f"{i:04d}.jpg"), seed=i)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        c2w = np.concatenate([_circle_pose(i, n), [[0, 0, 0, 1]]], axis=0)
        np.savetxt(os.path.join(root, "poses", f"{i:04d}.txt"), c2w)
    traj = np.stack(
        [np.concatenate([_circle_pose(i, 6), [[0, 0, 0, 1]]], 0)
         for i in range(6)]
    )
    np.savetxt(os.path.join(root, "traj.txt"), traj.reshape(6, -1))
    _check(dataset_dict["replica"](root, split="train"), 4)   # even idx
    _check(dataset_dict["replica"](root, split="test"), 4)    # odd idx
    tr = dataset_dict["replica"](root, split="test_traj")
    assert tr.poses.shape == (6, 3, 4)


# --------------------------------------------------------------- mill19 --
def test_mill19(tmp_path):
    torch = pytest.importorskip("torch")
    root = str(tmp_path / "mill19-building")
    n = 4
    os.makedirs(os.path.join(root, "train/metadata"), exist_ok=True)
    torch.save(
        {"origin_drb": torch.tensor([10.0, 20.0, 30.0]),
         "pose_scale_factor": 50.0},
        os.path.join(root, "coordinates.pt"),
    )
    for i in range(n):
        _write_img(os.path.join(root, "train/rgbs", f"{i + 1:06d}.jpg"),
                   seed=i)
        torch.save(
            {"W": W0, "H": H0,
             "intrinsics": torch.tensor([35.0, 35.0, W0 / 2, H0 / 2]),
             "c2w": torch.tensor(_circle_pose(i, n), dtype=torch.float64)},
            os.path.join(root, "train/metadata", f"{i + 1:06d}.pt"),
        )
    ds = dataset_dict["mill19"](root, split="train")
    assert ds.ray_altitude_range == [8, 50]   # 'building' altitude offsets
    _check(ds, n)


# --------------------------------------------------------------- eyeful --
def test_eyeful(tmp_path):
    root = str(tmp_path / "eyeful")
    os.makedirs(root, exist_ok=True)
    n = 5
    K = np.array([[35.0, 0, W0 / 2], [0, 35.0, H0 / 2], [0, 0, 1]])
    krt = []
    for i in range(n):
        cam = f"cam{i}"
        c2w = np.concatenate([_circle_pose(i, n), [[0, 0, 0, 1]]], axis=0)
        w2c = np.linalg.inv(c2w)
        krt.append({
            "cameraId": cam, "width": W0, "height": H0,
            "K": K.T.tolist(), "T": w2c.T.tolist(),
        })
        _write_img(os.path.join(root, "images", f"{cam}.jpg"), seed=i)
    with open(os.path.join(root, "cameras.json"), "w") as f:
        json.dump({"KRT": krt}, f)
    with open(os.path.join(root, "splits.json"), "w") as f:
        json.dump({"train": ["cam0", "cam1", "cam2"],
                   "test": ["cam3", "cam4"]}, f)
    ds = dataset_dict["eyeful"](root, split="train", downsample=0.5)
    _check(ds, 3)
    _check(dataset_dict["eyeful"](root, split="test", downsample=0.5), 2)


# ----------------------------------------------------------------- rtmv --
def test_rtmv(tmp_path):
    root = str(tmp_path / "rtmv-bricks")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    n = 6
    for i in range(n):
        c2w = np.concatenate([_circle_pose(i, n), [[0, 0, 0, 1]]], axis=0)
        meta = {
            "camera_data": {
                "scene_center_3d_box": [0.0, 0.0, 0.0],
                "scene_min_3d_box": [-5.0, -5.0, -5.0],
                "scene_max_3d_box": [5.0, 5.0, 5.0],
                "intrinsics": {"fx": 35.0, "fy": 35.0,
                               "cx": W0 / 2, "cy": H0 / 2},
                "width": W0, "height": H0,
                "cam2world": c2w.T.tolist(),
            }
        }
        with open(os.path.join(root, f"{i:05d}.json"), "w") as f:
            json.dump(meta, f)
        _write_img(os.path.join(root, "images", f"{i:05d}.png"), seed=i)
    ds = dataset_dict["rtmv"](root, split="train")
    _check(ds, n)
    # 'bricks': poses bounded into [-0.5, 0.5] (rtmv.py semantics)
    assert np.abs(ds.poses[..., 3]).max() <= 0.5 + 1e-6


# ------------------------------------------------- colmap text + pfm ----
def test_colmap_utils_text(tmp_path):
    from radnerf_tpu.data.colmap_utils import read_model

    d = str(tmp_path)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 40 30 35.0 20.0 15.0\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("1 1 0 0 0 0.5 0.25 4.0 1 im00.png\n")
        f.write("1.0 2.0 7 3.0 4.0 9\n")
    cams, images, _ = read_model(d, ext=".txt")
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert cams[1].width == 40 and cams[1].params[0] == 35.0
    assert images[1].name == "im00.png"
    np.testing.assert_allclose(images[1].tvec, [0.5, 0.25, 4.0])
    np.testing.assert_allclose(images[1].point3D_ids, [7, 9])


def test_read_pfm(tmp_path):
    from radnerf_tpu.data.depth_utils import read_pfm

    data = np.arange(48, dtype="<f4").reshape(6, 8)
    p = str(tmp_path / "d.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n8 6\n-1.0\n")
        f.write(data.tobytes())
    out, scale = read_pfm(p)
    assert out.shape == (6, 8) and scale == 1.0
    np.testing.assert_allclose(out, np.flipud(data))
