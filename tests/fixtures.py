"""Synthetic on-disk dataset fixtures for integration tests: a minimal NSVF
layout (bbox.txt, intrinsics.txt, rgb/, pose/) with procedurally rendered
views of a colored sphere."""

import os

import numpy as np


def look_at(eye, target=(0, 0, 0), up=(0, 0, 1)):
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    d = np.cross(f, r)  # down (right-down-front convention)
    c2w = np.stack([r, d, f, eye], axis=1)  # (3, 4)
    return c2w


def render_sphere_image(c2w, K, wh, radius=0.35):
    """Trivial CPU ray tracer: opaque colored sphere at origin, white bg."""
    w, h = wh
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    dirs = np.stack(
        [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)],
        -1,
    )
    rd = dirs @ c2w[:, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:, 3]
    b = 2 * np.sum(ro * rd, -1)
    c = np.sum(ro * ro) - radius**2
    disc = b * b - 4 * c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0))) / 2
    pts = ro + t[..., None] * rd
    color = np.clip(0.5 + pts, 0, 1)
    img = np.ones((h, w, 3), np.float32)
    img[hit & (t > 0)] = color[hit & (t > 0)]
    return img


def make_nsvf_dataset(root, n_train=6, n_test=2, wh=(32, 32)):
    """Write a Synthetic-NSVF-style scene; returns root."""
    import imageio.v2 as imageio

    root = os.path.join(root, "Synthetic_NeRF", "TestSphere")
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "pose"), exist_ok=True)
    w, h = wh
    focal = 1.2 * w
    # NSVF 'Synthetic' intrinsics: first token of first line is focal and
    # images are forced to 800*downsample; we use downsample = w/800.
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write(f"{focal / (w / 800.0)} 0 {400} 0\n0 {focal / (w / 800.0)} "
                f"{400} 0\n0 0 1 0\n0 0 0 1\n")
    np.savetxt(
        os.path.join(root, "bbox.txt"),
        np.array([[-0.6, -0.6, -0.6, 0.6, 0.6, 0.6, 0.1]]),
    )
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    rng = np.random.default_rng(0)
    for split, n, prefix in ((0, n_train, "0_"), (1, n_test, "1_"),
                             (2, n_test, "2_")):
        for i in range(n):
            th = 2 * np.pi * (i + split * 0.33) / n
            eye = np.array(
                [1.4 * np.cos(th), 1.4 * np.sin(th), 0.7 + 0.2 * split]
            )
            c2w = look_at(eye)
            img = render_sphere_image(c2w, K, wh)
            name = f"{prefix}{i:04d}"
            imageio.imsave(
                os.path.join(root, "rgb", name + ".png"),
                (img * 255).astype(np.uint8),
            )
            np.savetxt(
                os.path.join(root, "pose", name + ".txt"),
                np.vstack([c2w, [0, 0, 0, 1]]),
            )
    return root
