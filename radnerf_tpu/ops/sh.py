"""Real spherical-harmonics direction encoding (degree <= 4).

TPU twin of tinycudann's "SphericalHarmonics" encoding used as the
direction encoder (reference: models/networks.py:70-77, degree 4 -> 16
coefficients). Matches tcnn's convention: the input is (d + 1) / 2 for a
unit direction d, i.e. components in [0, 1]; internally mapped back to
[-1, 1]. Closed-form polynomials — pure VPU work, fused by XLA into the
surrounding rgb-MLP matmul; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(d01: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate real SH basis at directions.

    Args:
        d01: (..., 3) directions mapped to [0, 1] (i.e. (d+1)/2, d unit).
        degree: 1..4; output has degree**2 coefficients.
    Returns:
        (..., degree**2) float32 SH features.
    """
    d = d01 * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1).astype(jnp.float32)


def sh_encode_dir(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Convenience: normalize a raw direction and encode (matches the model's
    usage `dir_encoder((d/||d|| + 1) / 2)`, reference networks.py:121-123)."""
    d = d / jnp.clip(
        jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12, None
    )
    return sh_encode((d + 1.0) * 0.5, degree)
