"""Image metrics: PSNR / SSIM (+optional LPIPS via torch, CPU-only).

Twin of the reference's torchmetrics usage (train_ml.py:64-68) and
metrics.py:4-15. PSNR/SSIM are pure JAX; LPIPS (VGG) is optional and
gated exactly like `--eval_lpips`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    return jnp.mean(value)


def psnr(image_pred, image_gt, valid_mask=None, data_range: float = 1.0):
    return -10.0 * jnp.log10(
        mse(image_pred, image_gt, valid_mask) / data_range**2
    )


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair (gaussian-windowed, matching
    torchmetrics' defaults: 11x11 window, sigma 1.5)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]

    def filt(x):  # (H, W, C) -> same, per-channel gaussian filter
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # (C, 1, H, W)
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(kern, (2, 3, 0, 1)), (1, 1), "VALID"
        )
        return jnp.transpose(y[:, 0], (1, 2, 0))

    mu0, mu1 = filt(img0), filt(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = filt(img0 * img0) - mu00
    s11 = filt(img1 * img1) - mu11
    s01 = filt(img0 * img1) - mu01
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


def lpips_vgg(img0, img1):
    """Optional LPIPS(vgg) via torchmetrics on CPU (eval-only, off the hot
    path — mirrors `--eval_lpips`). Raises ImportError when unavailable."""
    import numpy as np
    import torch
    from torchmetrics.image.lpip import (
        LearnedPerceptualImagePatchSimilarity,
    )

    metric = lpips_vgg._metric if hasattr(lpips_vgg, "_metric") else None
    if metric is None:
        metric = LearnedPerceptualImagePatchSimilarity("vgg")
        lpips_vgg._metric = metric

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32))
        t = t.permute(2, 0, 1)[None]
        return torch.clip(t * 2 - 1, -1, 1)

    with torch.no_grad():
        return float(metric(prep(img0), prep(img1)))
