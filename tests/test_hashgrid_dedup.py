"""Run-length-dedup hash encode: exactness vs the reference gather path.

The dedup encode merges only samples with identical integer voxel coords,
so its output must match ops.hashgrid.hashgrid_encode at the same compute
dtype, and its custom backward must match XLA autodiff of the reference
path — on ray-coherent inputs (dedup active) AND on scrambled inputs
(overflow -> lax.cond fallback).
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from test_fast.sh

import jax
import jax.numpy as jnp
import numpy as np

from radnerf_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, \
    init_hashgrid_table
from radnerf_tpu.ops.hashgrid_dedup import (

    BLOCK,
    _group_levels,
    hashgrid_encode_dedup,
    hashgrid_encode_dedup_fwd_impl,
    hashgrid_table_grad_dedup,
    level_caps,
)


CFG = HashGridConfig.for_scene_scale(
    0.5, n_levels=6, log2_table_size=8, base_resolution=4,
    max_resolution_mult=256.0,
)


def ray_like_points(n=512, seed=0):
    """Points marching along straight lines — long voxel runs at coarse
    levels, like real marched samples."""
    rng = np.random.default_rng(seed)
    n_rays = n // 64
    o = rng.uniform(0.05, 0.3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = np.linspace(0, 0.6, 64, dtype=np.float32)
    x = o[:, None, :] + t[None, :, None] * d[:, None, :]
    return jnp.asarray(np.clip(x.reshape(-1, 3), 0.0, 1.0))


def scrambled_points(n=512, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))


def test_caps_are_static_and_grouped():
    caps = level_caps(CFG)
    assert len(caps) == CFG.n_levels
    assert all(8 <= c <= BLOCK for c in caps)
    groups, plain = _group_levels(caps, BLOCK)
    covered = sorted(sum((g[0] for g in groups), []) + plain)
    assert covered == list(range(CFG.n_levels))


def test_forward_matches_reference_f32():
    table = init_hashgrid_table(jax.random.PRNGKey(0), CFG)
    for pts in (ray_like_points(), scrambled_points()):
        want = hashgrid_encode(table, pts, CFG, jnp.float32)
        got = hashgrid_encode_dedup_fwd_impl(
            table, pts, CFG, jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
        )


def test_forward_matches_reference_bf16():
    table = init_hashgrid_table(jax.random.PRNGKey(0), CFG)
    pts = ray_like_points()
    want = hashgrid_encode(table, pts, CFG, jnp.bfloat16)
    got = hashgrid_encode_dedup_fwd_impl(table, pts, CFG, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-4,
    )


def test_forward_unaligned_n():
    """N not divisible by BLOCK: tail padding must not corrupt output."""
    table = init_hashgrid_table(jax.random.PRNGKey(0), CFG)
    pts = ray_like_points()[: 64 * 3 + 17]
    want = hashgrid_encode(table, pts, CFG, jnp.float32)
    got = hashgrid_encode_dedup_fwd_impl(table, pts, CFG, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )


def _table_grad_ref(table, pts, g):
    def f(tb):
        return jnp.sum(hashgrid_encode(tb, pts, CFG, jnp.float32) * g)

    return jax.grad(f)(table)


def test_backward_matches_autodiff_dedup_and_fallback():
    table = init_hashgrid_table(jax.random.PRNGKey(0), CFG)
    for pts in (ray_like_points(), scrambled_points()):
        g = jax.random.normal(
            jax.random.PRNGKey(2), (pts.shape[0], CFG.out_dim)
        )
        want = _table_grad_ref(table, pts, g)
        got = hashgrid_table_grad_dedup(pts, g, CFG, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )


def test_custom_vjp_end_to_end():
    table = init_hashgrid_table(jax.random.PRNGKey(0), CFG)
    pts = ray_like_points()

    def loss_dedup(tb):
        out = hashgrid_encode_dedup(
            tb, pts, CFG, jnp.float32, interpret=True
        )
        return jnp.sum(out**2)

    def loss_ref(tb):
        return jnp.sum(hashgrid_encode(tb, pts, CFG, jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(loss_dedup)(table)
    v2, g2 = jax.value_and_grad(loss_ref)(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6
    )


def test_packed_f16_grad_matches_f32():
    """f16x2-packed sort payloads: per-update rounding only (the window
    kernel still accumulates f32) — grads must track the f32-exact path
    to ~f16 relative precision."""
    from radnerf_tpu.ops.hashgrid import hashgrid_indices_cm
    from radnerf_tpu.ops.hashgrid_window import hashgrid_table_grad_window

    pts = ray_like_points()
    g = 0.01 * jax.random.normal(
        jax.random.PRNGKey(5), (pts.shape[0], CFG.out_dim)
    )
    idx, w = hashgrid_indices_cm(pts, CFG)
    exact = np.asarray(hashgrid_table_grad_window(
        idx, w, g, CFG, interpret=True, pack_f16=False
    ))
    packed = np.asarray(hashgrid_table_grad_window(
        idx, w, g, CFG, interpret=True, pack_f16=True
    ))
    np.testing.assert_allclose(
        packed, exact, rtol=5e-2, atol=2e-3 * np.abs(exact).max()
    )
