"""Differentiable volume compositing with exact early-stop semantics.

TPU twin of `vren.composite_train_fw/bw` and `vren.composite_test_fw`
(reference: models/csrc/volumerendering.cu). The CUDA pair implements the
analytic VJP by hand (volumerendering.cu:125-151, suffix sums via scans);
here the forward is written so that JAX autodiff *derives the same
gradients*, including the early-termination cutoff:

  - transmittance uses the identity 1 - a = exp(-sigma*delta), so
    T_excl(s) = exp(-cumsum_{i<s} sigma_i*delta_i)  — exact and stable
    (no cumprod-of-near-zeros), and its VJP is the reference's suffix-sum
    formula.
  - the CUDA early stop `if (T <= T_threshold) break` zeroes both the
    contribution AND the gradient of samples after the break point; the mask
    `T_excl > T_threshold` reproduces exactly that (no gradient flows
    through a comparison).

Everything is dense (N_rays, S) + validity mask — the static-shape
counterpart of the reference's ragged CSR layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def composite_weights(
    sigmas: jnp.ndarray,
    deltas: jnp.ndarray,
    valid: jnp.ndarray,
    T_threshold: float = 1e-4,
    prev_transmittance: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample compositing weights w = alpha * T_exclusive * alive.

    Args:
        sigmas, deltas: (N, S) f32.
        valid: (N, S) bool sample mask.
        T_threshold: early-stop transmittance (rendering.py:226 default 1e-4).
        prev_transmittance: (N,) carry-in T for resumable (test-time)
            compositing (volumerendering.cu:231: T starts at 1 - opacity).
    Returns:
        (w, T_after): w (N, S) weights; T_after (N,) transmittance after the
        block (for the next resumable block).
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)
    alpha = 1.0 - jnp.exp(-sd)
    cum = jnp.cumsum(sd, axis=-1)
    t_excl = jnp.exp(-(cum - sd))  # exp of exclusive cumsum
    if prev_transmittance is not None:
        t_excl = t_excl * prev_transmittance[:, None]
    alive = t_excl > T_threshold
    w = alpha * t_excl * alive
    # Carry-out transmittance (only used by resumable test compositing): if
    # the ray dies mid-block, T freezes at its value entering the first dead
    # sample (t_excl is non-increasing, so that's the max over dead slots);
    # otherwise T continues through the last sample.
    dead = ~alive
    t_frozen = jnp.max(jnp.where(dead, t_excl, 0.0), axis=-1)
    t_last = t_excl[:, -1] * (1.0 - alpha[:, -1])
    t_after = jnp.where(jnp.any(dead, axis=-1), t_frozen, t_last)
    return w, t_after


def composite_train(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    T_threshold: float = 1e-4,
) -> dict:
    """Front-to-back compositing of a full ray batch.

    Twin of `VolumeRenderer.apply` (custom_functions.py:115-159) on the dense
    layout. Args are (N, S) / (N, S, 3); returns a dict:
        opacity (N,), depth (N,), rgb (N, 3), ws (N, S),
        vr_samples (N,) — number of samples that contributed.
    """
    w, _ = composite_weights(sigmas, deltas, valid, T_threshold)
    opacity = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * ts, axis=-1)
    rgb = jnp.sum(w[..., None] * rgbs, axis=-2)
    vr_samples = jnp.sum((w > 0).astype(jnp.int32), axis=-1)
    return {
        "opacity": opacity,
        "depth": depth,
        "rgb": rgb,
        "ws": w,
        "vr_samples": vr_samples,
    }


def composite_test_block(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    acc: dict,
    T_threshold: float = 1e-4,
) -> dict:
    """One resumable compositing block (twin of vren.composite_test_fw).

    `acc` carries {opacity, depth, rgb, transmittance, alive}; returns the
    updated carry. Dead rays (alive=False) pass through unchanged — the
    dense-mask equivalent of the CUDA kernel's alive_indices retirement.
    """
    T_in = acc["transmittance"]
    mask = valid & acc["alive"][:, None]
    w, t_after = composite_weights(
        sigmas, deltas, mask, T_threshold, prev_transmittance=T_in
    )
    opacity = acc["opacity"] + jnp.sum(w, axis=-1)
    depth = acc["depth"] + jnp.sum(w * ts, axis=-1)
    rgb = acc["rgb"] + jnp.sum(w[..., None] * rgbs, axis=-2)
    alive = acc["alive"] & (t_after > T_threshold)
    return {
        "opacity": opacity,
        "depth": depth,
        "rgb": rgb,
        "transmittance": t_after,
        "alive": alive,
    }
