"""Ray-AABB and ray-sphere intersection.

TPU twins of `vren.ray_aabb_intersect` / `vren.ray_sphere_intersect`
(reference: models/csrc/intersection.cu). The reference's main path only ever
intersects with ONE box (the scene bbox, rendering.py:29), so the general
ray x voxel kernel degenerates to a closed-form slab test — a handful of
vectorized VPU ops, no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    centers: jnp.ndarray,
    half_sizes: jnp.ndarray,
) -> jnp.ndarray:
    """Slab test of N rays against M axis-aligned boxes.

    Matches the semantics of intersection.cu:5-100: entry t is clamped to
    >= 0; rays that miss a box get t = (-1, -1).

    Args:
        rays_o: (N, 3) ray origins.
        rays_d: (N, 3) ray directions (not necessarily unit).
        centers: (M, 3) box centers.
        half_sizes: (M, 3) box half sizes.
    Returns:
        hits_t: (N, M, 2) [t_near, t_far] per (ray, box); (-1, -1) on miss.
    """
    inv_d = 1.0 / rays_d  # (N, 3); inf on zero components is handled below
    # (N, 1, 3) broadcast against (1, M, 3)
    o = rays_o[:, None, :]
    inv = inv_d[:, None, :]
    lo = (centers - half_sizes)[None, :, :]
    hi = (centers + half_sizes)[None, :, :]
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.minimum(t0, t1).max(axis=-1)  # (N, M)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    hit = tmax > jnp.maximum(tmin, 0.0)
    t_near = jnp.maximum(tmin, 0.0)
    hits_t = jnp.stack(
        [jnp.where(hit, t_near, -1.0), jnp.where(hit, tmax, -1.0)], axis=-1
    )
    return hits_t


def ray_sphere_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
) -> jnp.ndarray:
    """Quadratic ray-sphere test (reference: intersection.cu:103-197).

    Args:
        rays_o: (N, 3); rays_d: (N, 3); centers: (M, 3); radii: (M,).
    Returns:
        hits_t: (N, M, 2) [t_near, t_far], (-1, -1) on miss.
    """
    oc = rays_o[:, None, :] - centers[None, :, :]  # (N, M, 3)
    a = jnp.sum(rays_d * rays_d, axis=-1)[:, None]  # (N, 1)
    b = 2.0 * jnp.sum(oc * rays_d[:, None, :], axis=-1)  # (N, M)
    c = jnp.sum(oc * oc, axis=-1) - (radii**2)[None, :]
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    hit = (disc > 0) & (t1 > 0)
    t_near = jnp.maximum(t0, 0.0)
    return jnp.stack(
        [jnp.where(hit, t_near, -1.0), jnp.where(hit, t1, -1.0)], axis=-1
    )


def scene_near_far(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    center: jnp.ndarray,
    half_size: jnp.ndarray,
    near_distance: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-box intersection with near-plane clamping, as used by the
    render entry points (reference: models/rendering.py:28-30).

    Returns:
        (t1, t2): each (N,); t1 = -1 where the ray misses the scene box.
    """
    hits_t = ray_aabb_intersect(
        rays_o, rays_d, center[None, :], half_size[None, :]
    )[:, 0]
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    t1 = jnp.where((t1 >= 0) & (t1 < near_distance), near_distance, t1)
    return t1, t2
