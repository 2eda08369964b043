"""MipNeRF-360 distortion loss on the dense sample layout.

TPU twin of `vren.distortion_loss_fw/bw` (reference: models/csrc/losses.cu,
DVGO-v2 prefix-sum formulation, arXiv:2206.05085):

  loss_ray = sum_s 2*(wts_incl_s * ws_excl_s - ws_incl_s * wts_excl_s)
             + 1/3 * w_s^2 * delta_s

The CUDA pair hand-derives the VJP from the stored inclusive scans
(losses.cu:113-142); with the loss written via jnp.cumsum, JAX autodiff
produces exactly that gradient — no custom kernel needed (two cumsums per
ray are memory-bound VPU work).
"""

from __future__ import annotations

import jax.numpy as jnp


def distortion_loss(
    ws: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Per-ray distortion loss.

    Args:
        ws: (N, S) compositing weights; deltas, ts: (N, S); valid: (N, S).
    Returns:
        (N,) per-ray loss.
    """
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_incl = jnp.cumsum(w, axis=-1)
    wts_incl = jnp.cumsum(wt, axis=-1)
    ws_excl = ws_incl - w
    wts_excl = wts_incl - wt
    per_sample = 2.0 * (wts_incl * ws_excl - ws_incl * wts_excl) + (
        w * w * deltas / 3.0
    )
    return jnp.sum(jnp.where(valid, per_sample, 0.0), axis=-1)


def distortion_loss_flat(
    ws: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    ray_id: jnp.ndarray,
    offsets: jnp.ndarray,
    cap: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Distortion loss on the flat (static-CSR) layout — per-ray segmented
    scans, same math as :func:`distortion_loss`."""
    from .compositing import segmented_cumsum

    B = ws.shape[0]
    seg_start = jnp.arange(B, dtype=jnp.int32) == jnp.take(offsets, ray_id)
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_incl = segmented_cumsum(w, seg_start)
    wts_incl = segmented_cumsum(wt, seg_start)
    per_sample = 2.0 * (
        wts_incl * (ws_incl - w) - ws_incl * (wts_incl - wt)
    ) + (w * w * deltas / 3.0)
    loss_cum = segmented_cumsum(
        jnp.where(valid, per_sample, 0.0), seg_start
    )
    present = (cap > 0) & (offsets < B)
    ends = jnp.minimum(jnp.where(present, offsets + cap - 1, 0), B - 1)
    return jnp.where(present, jnp.take(loss_cum, ends), 0.0)
