"""Morton (Z-order) encode/decode and occupancy-bitfield packing.

TPU twins of the reference's `vren.morton3D / morton3D_invert / packbits`
CUDA kernels (reference: models/csrc/raymarching.cu:35-161). Implemented as
vectorized integer bit-twiddling — XLA compiles these to VPU ops; no custom
kernel is needed at this arithmetic intensity.

NOTE on layout: the reference stores the density grid in Morton order so the
CUDA bitfield lookup is cache-friendly. The TPU framework stores occupancy in
*linear* (c, x, y, z) order (gathers on TPU don't benefit from Morton
locality); these ops exist for API parity, checkpoint interop and tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits after each of the low 10 bits of v (uint32)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """3-D Morton code of integer coords.

    Args:
        coords: (..., 3) int array, each component in [0, 1024).
    Returns:
        (...,) int32 Morton indices.
    """
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`morton3d`.

    Args:
        indices: (...,) int Morton indices.
    Returns:
        (..., 3) int32 coords.
    """
    idx = indices.astype(jnp.uint32)
    x = _compact_bits(idx >> 0)
    y = _compact_bits(idx >> 1)
    z = _compact_bits(idx >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(density_grid: jnp.ndarray, density_threshold) -> jnp.ndarray:
    """Pack a float density grid into a uint8 bitfield.

    bitfield[n] = OR_i (grid[8n+i] > thresh) << i
    (reference: models/csrc/raymarching.cu:122-161).

    Args:
        density_grid: (..., M) float grid, M divisible by 8. Leading axes
            (e.g. cascades) are preserved.
        density_threshold: scalar (may be traced).
    Returns:
        (..., M // 8) uint8 bitfield.
    """
    occ = (density_grid > density_threshold).astype(jnp.uint8)
    occ = occ.reshape(*density_grid.shape[:-1], -1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(occ << shifts, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`packbits` (to boolean occupancy)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*bitfield.shape[:-1], -1).astype(jnp.bool_)
