"""Image IO and color-space helpers (twin of datasets/color_utils.py)."""

from __future__ import annotations

import numpy as np


def srgb_to_linear(img: np.ndarray) -> np.ndarray:
    limit = 0.04045
    return np.where(
        img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92
    )


def linear_to_srgb(img: np.ndarray) -> np.ndarray:
    limit = 0.0031308
    img = np.where(
        img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img
    )
    return np.clip(img, 0.0, 1.0)


def read_image(
    img_path: str,
    img_wh: tuple[int, int],
    blend_a: bool = True,
    unpad: int = 0,
) -> np.ndarray:
    """Load an image as a flattened (H*W, 3) float array in [0, 1]
    (color_utils.py:21-35): alpha is blended onto white (or premultiplied),
    optional border unpadding, resize to img_wh."""
    import imageio.v2 as imageio
    import cv2

    img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[2] == 4:  # alpha blend (blend A to RGB)
        if blend_a:
            img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        else:
            img = img[..., :3] * img[..., -1:]
    else:
        img = img[..., :3]
    if unpad > 0:
        img = img[unpad:-unpad, unpad:-unpad]
    if (img.shape[1], img.shape[0]) != tuple(img_wh):
        img = cv2.resize(img, tuple(img_wh))
    return img.reshape(-1, 3)


def read_images(
    paths: list[str],
    img_wh: tuple[int, int],
    blend_a: bool = True,
    unpad: int = 0,
) -> np.ndarray:
    """Batch image load: native threaded C++ decoder (native/radnerf_io.cpp)
    when available, Python per-image fallback otherwise.

    Returns (n, W*H, 3) float32 in [0, 1]."""
    from .native import load_images

    out = load_images(paths, img_wh, blend_a=blend_a, unpad=unpad)
    if out is not None:
        return out
    return np.stack(
        [read_image(p, img_wh, blend_a=blend_a, unpad=unpad) for p in paths]
    ).astype(np.float32)


def depth2img(depth: np.ndarray) -> np.ndarray:
    """Turbo-colormapped depth visualization (train.py:48-53)."""
    import cv2

    depth = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-8)
    return cv2.applyColorMap(
        (depth * 255).astype(np.uint8), cv2.COLORMAP_TURBO
    )
