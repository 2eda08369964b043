"""Cube-brick hash-grid encode: fast path vs the brick3-ref ground truth.

brick3 packs a 5x5x5 lattice cube per 128-lane row, so all 8 trilinear
corners of a cell live in ONE row (one gather per level-point, one
sorted backward entry). Ground truth is hashgrid_encode_brick3_ref
(same addressing, naive per-corner scalar gathers, XLA autodiff
backward). See ops/hashgrid_brick3.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.ops.hashgrid import HashGridConfig, init_hashgrid_table
from radnerf_tpu.ops.hashgrid_brick3 import (
    _OFFS3,
    LANES,
    PATCH,
    PLANE,
    brick3_addrs,
    hashgrid_encode_brick3,
    hashgrid_encode_brick3_fwd_impl,
    hashgrid_encode_brick3_ref,
    hashgrid_table_grad_brick3,
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


def test_brick3_addrs():
    addrs = brick3_addrs(CFG)
    R = CFG.table_size // LANES
    # T=2^13 (R=64): res 4 (2^3=8 rows) and res 8 (3^3=27) fit; res 16
    # needs 5^3=125 > 64 -> hashed
    assert [a.dense for a in addrs] == [True, True, False, False, False,
                                        False]
    for a in addrs:
        if a.dense:
            assert a.np_ ** 3 <= R
    # lane bound: corner lane max = 4 + 5*4 + 25*4 = 124 < 128
    assert (PATCH) + PLANE * PATCH + PLANE * PLANE * PATCH < LANES
    assert max(_OFFS3) == 1 + PLANE + PLANE * PLANE


def test_forward_matches_brick3_ref():
    table, x = _data()
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_brick3_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_brick3_fwd_impl(table, x, CFG)
    assert out.shape == (1000, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_forward_small_n():
    table, x = _data(n=77)
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_brick3_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_brick3_fwd_impl(table, x, CFG)
    assert out.shape == (77, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_table_grad_matches_ref_autodiff():
    table, x = _data(n=500)
    g = jax.random.normal(jax.random.PRNGKey(3), (500, CFG.out_dim))

    def ref_loss(t):
        return jnp.sum(
            hashgrid_encode_brick3_ref(t, x, CFG, jnp.float32) * g
        )

    ref_grad = jax.grad(ref_loss)(table)
    grad = hashgrid_table_grad_brick3(x, g, CFG, interpret=True,
                                      exact=True)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=1e-5, atol=1e-6
    )


def test_fused_custom_vjp_bf16_kernel():
    table, x = _data(n=300)
    g = jax.random.normal(jax.random.PRNGKey(4), (300, CFG.out_dim))

    def loss(t):
        return jnp.sum(
            hashgrid_encode_brick3(t, x, CFG, jnp.bfloat16, interpret=True)
            .astype(jnp.float32) * g
        )

    grad = jax.grad(loss)(table)

    def ref_loss(t):
        return jnp.sum(
            hashgrid_encode_brick3_ref(t, x, CFG, jnp.float32) * g
        )

    ref_grad = jax.grad(ref_loss)(table)
    # fast path: f32 sort payloads, bf16 V rows in the window matmul
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=3e-2, atol=3e-2
    )
    # x gets no gradient (reference RayMarcher position grads unused)
    gx = jax.grad(
        lambda xx: jnp.sum(
            hashgrid_encode_brick3(
                table, xx, CFG, jnp.bfloat16, interpret=True
            ).astype(jnp.float32)
        )
    )(x)
    assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_unsorted_stream_still_exact():
    """The kernel windows span MIN/MAX of each 128-entry sub-row, so a
    NON-sorted stream must still produce the exact gradient (only
    slower) — this is what lets dense coherent levels skip the sort."""
    from radnerf_tpu.ops.hashgrid_brick3 import (
        _bwd_streams3,
        sorted_table_grad_brick3,
    )

    table, x = _data(n=256)
    g = jax.random.normal(jax.random.PRNGKey(5), (256, CFG.out_dim))
    key, v = _bwd_streams3(x, g.astype(jnp.float32), CFG)
    raw = sorted_table_grad_brick3(          # NOT sorted
        key, v, CFG.table_size, interpret=True, exact=True
    )

    def ref_loss(t):
        return jnp.sum(
            hashgrid_encode_brick3_ref(t, x, CFG, jnp.float32) * g
        )

    ref_grad = jax.grad(ref_loss)(table)
    np.testing.assert_allclose(
        np.asarray(raw), np.asarray(ref_grad), rtol=1e-5, atol=1e-6
    )


def _ray_stream(n_rays=8, k=256, seed=2):
    """dt_min-lattice ray-ordered samples (the run-dedup's assumption)."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.1
    d = -o + rng.normal(size=(n_rays, 3)) * 0.05
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    dt = 2.0 * np.sqrt(3.0) / 1024.0          # dt_min at scale 1 domain
    t = 0.6 + np.arange(k) * dt
    pts = (o[:, None] + t[None, :, None] * d[:, None]).reshape(-1, 3)
    return jnp.asarray(np.clip(pts * 0.4 + 0.5, 1e-3, 1 - 1e-3),
                       jnp.float32)


def test_runs_mode_matches_plain_on_ray_stream():
    """fw_mode='runs' is EXACT vs 'plain' on a ray-coherent stream (the
    dedup path engages: 2048 samples >= RUN_BLOCK, runs ~dozens of
    samples at coarse levels)."""
    table, _ = _data()
    x = _ray_stream()
    plain = hashgrid_encode_brick3_fwd_impl(table, x, CFG, "plain")
    runs = hashgrid_encode_brick3_fwd_impl(table, x, CFG, "runs")
    # near-exact: the fused extract kernel's fast path quantizes the
    # trilinear stencil weights through bf16 (one rounding; outputs are
    # bf16 anyway), so runs vs plain may differ by <= 1 output ulp
    np.testing.assert_allclose(
        np.asarray(plain, np.float32), np.asarray(runs, np.float32),
        rtol=1e-2, atol=2e-3,
    )


def test_runs_mode_random_points_fall_back_exactly():
    """Spatially-random points overflow the run caps of every level
    except the coarsest (res 4: ~all points share ONE cube patch, so
    the dedup path legitimately engages there) -> the lax.cond fallback
    must reproduce the plain gather exactly on the overflowing levels
    and within one bf16 stencil ulp on the dedup'd one."""
    table, x = _data(n=1024, seed=9)
    plain = np.asarray(
        hashgrid_encode_brick3_fwd_impl(table, x, CFG, "plain"),
        np.float32,
    )
    runs = np.asarray(
        hashgrid_encode_brick3_fwd_impl(table, x, CFG, "runs"),
        np.float32,
    )
    # levels 1..5 overflow -> exact fallback; level 0 (cols 0,1 in the
    # level-major layout) runs the fused dedup kernel -> <= 1 ulp
    np.testing.assert_array_equal(plain[:, 2:], runs[:, 2:])
    np.testing.assert_allclose(
        plain[:, :2], runs[:, :2], rtol=1e-2, atol=2e-3
    )


def test_within_patch_continuity():
    """Cells inside a cube patch share corner entries: continuous across
    any cell boundary that is NOT a 4-cell patch boundary."""
    table, _ = _data()
    # x boundary at cell 5 of the finest level: 5 % 4 != 0 -> same patch
    xb = (5.0 - 0.5) / (CFG.level_scales()[-1])
    eps = 1e-5
    pts = jnp.asarray(
        [[xb - eps, 0.37, 0.61], [xb + eps, 0.37, 0.61]], jnp.float32
    )
    out = hashgrid_encode_brick3_fwd_impl(table, pts, CFG)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(out[1], np.float32),
        rtol=0.05, atol=0.05,
    )


def test_finite_everywhere():
    cfg = HashGridConfig.for_scene_scale(0.5, n_levels=8,
                                         log2_table_size=15)
    table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (98304, 3))
    out = np.asarray(hashgrid_encode_brick3_fwd_impl(table, x, cfg),
                     np.float32)
    assert np.isfinite(out).all()


def test_dispatch_brick3_f32_falls_back():
    from radnerf_tpu.ops.hashgrid import encode_dispatch, hashgrid_encode

    table, x = _data(n=64)
    out = encode_dispatch(table, x, CFG, jnp.float32, impl="brick3")
    ref = hashgrid_encode(table, x, CFG, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
