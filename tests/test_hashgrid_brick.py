"""Brick-layout hash-grid encode: fast path vs the brick-ref ground truth.

The brick impl uses its own patch-row addressing (one 128-lane row per
11x11 xy lattice patch per z-slice), so its ground truth is
hashgrid_encode_brick_ref (same addressing, naive per-corner scalar
gathers, XLA autodiff backward) — NOT ops.hashgrid.hashgrid_encode.
See ops/hashgrid_brick.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.ops.hashgrid import HashGridConfig, init_hashgrid_table
from radnerf_tpu.ops.hashgrid_brick import (
    LANES,
    PATCH,
    PLANE,
    brick_addrs,
    hashgrid_encode_brick,
    hashgrid_encode_brick_fwd_impl,
    hashgrid_encode_brick_ref,
    hashgrid_table_grad_brick,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from test_fast.sh

CFG = HashGridConfig(
    n_levels=6,
    n_features=2,
    log2_table_size=13,
    base_resolution=4,
    per_level_scale=2.0,     # res 4..128: exercises dense AND hashed classes
)


def _data(n=1000, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    table = init_hashgrid_table(k1, CFG) * 1e4   # O(1) values
    x = jax.random.uniform(k2, (n, 3), minval=0.001, maxval=0.999)
    return table, x


def test_brick_addrs():
    addrs = brick_addrs(CFG)
    R = CFG.table_size // LANES
    # T=2^13 (R=64): res 4/8 fit injectively (res 16 needs 2*2*18 = 72
    # rows > 64); finer levels hashed
    assert [a.dense for a in addrs] == [True, True, False, False, False,
                                        False]
    for a in addrs:
        if a.dense:
            assert a.npx * a.npy * (a.res + 2) <= R
    # lane bound: base local coords <= PATCH-1 => corner lane <= 120 < 128
    assert (PATCH - 1) + PLANE * (PATCH - 1) + (PLANE + 1) < LANES
    # headline config: same dense/hashed split as the slab family (6 dense)
    head = brick_addrs(HashGridConfig.for_scene_scale(0.5))
    assert sum(a.dense for a in head) == 6


def test_forward_matches_brick_ref():
    table, x = _data()
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_brick_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_brick_fwd_impl(table, x, CFG)
    assert out.shape == (1000, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_forward_small_n():
    table, x = _data(n=77)
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_brick_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_brick_fwd_impl(table, x, CFG)
    assert out.shape == (77, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_table_grad_matches_ref_autodiff():
    table, x = _data(n=500)
    g = jax.random.normal(jax.random.PRNGKey(3), (500, CFG.out_dim))

    def ref_loss(t):
        return jnp.sum(
            hashgrid_encode_brick_ref(t, x, CFG, jnp.float32) * g
        )

    ref_grad = jax.grad(ref_loss)(table)
    grad = hashgrid_table_grad_brick(
        x, g, CFG, interpret=True, pack_f16=False
    )
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=1e-5, atol=1e-6
    )


def test_fused_custom_vjp_f16_packed():
    table, x = _data(n=300)
    g = jax.random.normal(jax.random.PRNGKey(4), (300, CFG.out_dim))

    def loss(t):
        return jnp.sum(
            hashgrid_encode_brick(t, x, CFG, jnp.bfloat16, interpret=True)
            .astype(jnp.float32) * g
        )

    grad = jax.grad(loss)(table)

    def ref_loss(t):
        return jnp.sum(
            hashgrid_encode_brick_ref(t, x, CFG, jnp.float32) * g
        )

    ref_grad = jax.grad(ref_loss)(table)
    # f16-packed payloads: ~3 decimal digits per update
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=3e-2, atol=3e-2
    )
    # x gets no gradient (reference RayMarcher position grads unused)
    gx = jax.grad(
        lambda xx: jnp.sum(
            hashgrid_encode_brick(
                table, xx, CFG, jnp.bfloat16, interpret=True
            ).astype(jnp.float32)
        )
    )(x)
    assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_within_patch_continuity():
    """Cells inside a patch share corner entries: the encode is continuous
    across any cell boundary that is NOT a patch boundary. (Patch-boundary
    points are stored once per adjacent patch and may differ — the
    documented deviation, quantified in docs/CONVERGENCE.md.)"""
    table, _ = _data()
    res = brick_addrs(CFG)[-1].res
    # x boundary at cell 5 of the finest level: 5 % 10 != 0 -> same patch
    xb = (5.0 - 0.5) / (CFG.level_scales()[-1])
    eps = 1e-5
    pts = jnp.asarray(
        [[xb - eps, 0.37, 0.61], [xb + eps, 0.37, 0.61]], jnp.float32
    )
    out = hashgrid_encode_brick_fwd_impl(table, pts, CFG)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(out[1], np.float32),
        rtol=0.05, atol=0.05,
    )
    del res


def test_finite_everywhere():
    """No out-of-bounds reads anywhere in [0,1]^3 (the brick layout has no
    boundary corner-case: corner lanes max out at 120 < 128)."""
    cfg = HashGridConfig.for_scene_scale(0.5, n_levels=8,
                                         log2_table_size=15)
    table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (98304, 3))
    out = np.asarray(hashgrid_encode_brick_fwd_impl(table, x, cfg),
                     np.float32)
    assert np.isfinite(out).all()


def test_dispatch_brick_f32_falls_back():
    from radnerf_tpu.ops.hashgrid import encode_dispatch, hashgrid_encode

    table, x = _data(n=64)
    out = encode_dispatch(table, x, CFG, jnp.float32, impl="brick")
    ref = hashgrid_encode(table, x, CFG, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
