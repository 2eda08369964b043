"""Slab-layout hash-grid encode: fast path vs the slab-ref ground truth.

The slab impl uses a DIFFERENT (additive, slab-adjacent) spatial hash than
the xor family, so its ground truth is hashgrid_encode_slab_ref (same
addressing, naive per-corner scalar gathers, XLA autodiff backward) — not
ops.hashgrid.hashgrid_encode. See ops/hashgrid_slab.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.ops.hashgrid import HashGridConfig, init_hashgrid_table
from radnerf_tpu.ops.hashgrid_slab import (
    hashgrid_encode_slab,
    hashgrid_encode_slab_fwd_impl,
    hashgrid_encode_slab_ref,
    hashgrid_table_grad_slab,
    level_addrs,
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


def test_level_classes():
    addrs = level_addrs(CFG)
    # T=2^13: res 4/8/16 injective (C=128, 9, 17); finer levels hashed
    assert [a.dense for a in addrs] == [True, True, True, False, False,
                                        False]
    for a in addrs:
        if a.dense:
            assert a.C * (a.res + 1) ** 2 <= CFG.table_size
        assert a.R * a.C <= CFG.table_size
    # the headline config: levels 0-5 injective, 6-15 hashed at C=1024
    head = level_addrs(HashGridConfig.for_scene_scale(0.5))
    assert sum(a.dense for a in head) == 6
    assert all(a.C == 1024 for a in head if not a.dense)


def test_forward_matches_slab_ref():
    table, x = _data()
    # ref on the bf16-quantized table, f32 accumulation: isolates the
    # addressing/fetch path from quantization differences
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_slab_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_slab_fwd_impl(table, x, CFG)
    assert out.shape == (1000, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_forward_unaligned_n():
    table, x = _data(n=77)
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hashgrid_encode_slab_ref(tq, x, CFG, jnp.float32)
    out = hashgrid_encode_slab_fwd_impl(table, x, CFG)
    assert out.shape == (77, CFG.out_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-3
    )


def test_table_grad_matches_ref_autodiff():
    table, x = _data(n=500)
    g = jax.random.normal(jax.random.PRNGKey(3), (500, CFG.out_dim))

    def ref_loss(t):
        return jnp.sum(hashgrid_encode_slab_ref(t, x, CFG, jnp.float32) * g)

    ref_grad = jax.grad(ref_loss)(table)
    grad = hashgrid_table_grad_slab(
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
            hashgrid_encode_slab(t, x, CFG, jnp.bfloat16, interpret=True)
            .astype(jnp.float32) * g
        )

    grad = jax.grad(loss)(table)

    def ref_loss(t):
        return jnp.sum(hashgrid_encode_slab_ref(t, x, CFG, jnp.float32) * g)

    ref_grad = jax.grad(ref_loss)(table)
    # f16-packed payloads: ~3 decimal digits per update
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=3e-2, atol=3e-2
    )
    # x gets no gradient (reference RayMarcher position grads unused)
    gx = jax.grad(
        lambda xx: jnp.sum(
            hashgrid_encode_slab(
                table, xx, CFG, jnp.bfloat16, interpret=True
            ).astype(jnp.float32)
        )
    )(x)
    assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_dedup_fw_over_slab_addressing_exact():
    """The run-length dedup forward (addr='slab') merges only identical
    voxels, so it must agree with the plain slab forward bit-for-bit up to
    accumulation order (ray-coherent stream: consecutive samples share
    voxels at coarse levels)."""
    from radnerf_tpu.ops.hashgrid_dedup import hashgrid_encode_dedup_fwd_impl

    table, _ = _data()
    # ray-coherent points: a few rays of consecutive samples
    o = jnp.asarray([[0.1, 0.2, 0.3], [0.8, 0.7, 0.2], [0.5, 0.1, 0.9]])
    d = jnp.asarray([[0.6, 0.5, 0.4], [-0.5, -0.4, 0.6], [0.0, 0.7, -0.6]])
    t = jnp.linspace(0.0, 0.9, 170)
    pts = jnp.clip(
        (o[:, None, :] + t[None, :, None] * d[:, None, :]).reshape(-1, 3),
        0.001, 0.999,
    )
    plain = hashgrid_encode_slab_fwd_impl(table, pts, CFG)
    dd = hashgrid_encode_dedup_fwd_impl(
        table, pts, CFG, jnp.bfloat16, addr="slab"
    )
    np.testing.assert_allclose(
        np.asarray(plain, np.float32), np.asarray(dd, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_dispatch_slab_f32_falls_back():
    from radnerf_tpu.ops.hashgrid import encode_dispatch, hashgrid_encode

    table, x = _data(n=64)
    out = encode_dispatch(table, x, CFG, jnp.float32, impl="slab")
    ref = hashgrid_encode(table, x, CFG, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_corner_sharing_continuity():
    """Field continuity across cell boundaries: neighbour cells must read
    the SAME table entries for their shared corners — encode at a point
    just left/right of an x cell boundary agrees in the limit."""
    table, _ = _data()
    addr = level_addrs(CFG)[-1]
    res = addr.res
    # a point whose x sits exactly on a cell boundary of the finest level
    xb = (5.0) / res
    eps = 1e-4 / res
    pts = jnp.asarray(
        [[xb - eps, 0.37, 0.61], [xb + eps, 0.37, 0.61]], jnp.float32
    )
    out = hashgrid_encode_slab_fwd_impl(table, pts, CFG)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(out[1], np.float32),
        rtol=0.05, atol=0.05,
    )


def test_no_nan_on_boundary_corners():
    """Regression: the additive address of the (q=R-2, m=C-1, y+1, x+1)
    corner lands exactly on T; unclamped it hit jnp.take's out-of-bounds
    fill, whose u32 sentinel unpacks to bf16 NaN (10 NaNs per ~1.5M
    samples at the convergence config). The forward clamps to T-1."""
    cfg = HashGridConfig.for_scene_scale(0.5, n_levels=8, log2_table_size=15)
    table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (98304, 3))
    out = np.asarray(hashgrid_encode_slab_fwd_impl(table, x, cfg),
                     np.float32)
    assert np.isfinite(out).all()

    from radnerf_tpu.ops.hashgrid_dedup import hashgrid_encode_dedup_fwd_impl

    out2 = np.asarray(
        hashgrid_encode_dedup_fwd_impl(
            table, x, cfg, jnp.bfloat16, addr="slab"
        ),
        np.float32,
    )
    assert np.isfinite(out2).all()
