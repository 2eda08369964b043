"""Pallas kernel tests (interpret mode on CPU): the hash-grid table
gradient must match the XLA-autodiff scatter exactly."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from test_fast.sh

import numpy as np
import jax
import jax.numpy as jnp

from radnerf_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_indices,
    init_hashgrid_table,
)
from radnerf_tpu.ops.hashgrid_pallas import (

    hashgrid_encode_fused,
    hashgrid_table_grad,
)


def small_cfg():
    return HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=10,
        base_resolution=4, per_level_scale=1.5,
    )


class TestHashgridPallasBackward:
    def test_matches_autodiff(self):
        cfg = small_cfg()
        table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (700, 3))
        gout = jax.random.normal(jax.random.PRNGKey(2), (700, cfg.out_dim))

        ref = jax.grad(
            lambda t: (hashgrid_encode(t, x, cfg) * gout).sum()
        )(table)
        got = jax.grad(
            lambda t: (
                hashgrid_encode_fused(t, x, cfg, jnp.float32, True) * gout
            ).sum()
        )(table)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_table_grad_direct(self):
        """Direct kernel call vs a numpy scatter-add."""
        cfg = small_cfg()
        rng = np.random.default_rng(0)
        N = 130  # non-multiple of tile -> exercises padding
        x = jnp.asarray(rng.random((N, 3)), jnp.float32)
        idx, w = hashgrid_indices(x, cfg)
        g = jnp.asarray(
            rng.standard_normal((N, cfg.out_dim)), jnp.float32
        )
        got = np.asarray(
            hashgrid_table_grad(idx, w, g, cfg, tile=64, interpret=True)
        )
        want = np.zeros((cfg.n_levels, cfg.table_size, 2), np.float32)
        idx_n, w_n, g_n = np.asarray(idx), np.asarray(w), np.asarray(g)
        for l in range(cfg.n_levels):
            for n in range(N):
                for c in range(8):
                    want[l, idx_n[l, n, c]] += (
                        w_n[l, n, c] * g_n[n, l * 2 : l * 2 + 2]
                    )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_no_grad_to_positions(self):
        cfg = small_cfg()
        table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        gx = jax.grad(
            lambda xx: hashgrid_encode_fused(
                table, xx, cfg, jnp.float32, True
            ).sum()
        )(x)
        np.testing.assert_array_equal(np.asarray(gx), 0.0)


class TestHashgridSortBackward:
    """The sort-based (pure XLA) table gradient (ops/hashgrid_sort.py)."""

    def test_matches_autodiff(self):
        from radnerf_tpu.ops.hashgrid_sort import hashgrid_encode_sort

        cfg = small_cfg()
        table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (700, 3))
        gout = jax.random.normal(jax.random.PRNGKey(2), (700, cfg.out_dim))
        ref = jax.grad(
            lambda t: (hashgrid_encode(t, x, cfg) * gout).sum()
        )(table)
        got = jax.grad(
            lambda t: (
                hashgrid_encode_sort(t, x, cfg, jnp.float32) * gout
            ).sum()
        )(table)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


class TestHashgridWindowBackward:
    """Sorted windowed-accumulation kernel (ops/hashgrid_window.py)."""

    def test_matches_autodiff(self):
        from radnerf_tpu.ops.hashgrid_window import hashgrid_encode_window

        cfg = small_cfg()
        table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (700, 3))
        gout = jax.random.normal(jax.random.PRNGKey(2), (700, cfg.out_dim))
        ref = jax.grad(
            lambda t: (hashgrid_encode(t, x, cfg) * gout).sum()
        )(table)
        got = jax.grad(
            lambda t: (
                hashgrid_encode_window(t, x, cfg, jnp.float32, True) * gout
            ).sum()
        )(table)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_sorted_scatter_direct(self):
        """Direct kernel vs numpy scatter-add, incl. end-of-table windows,
        duplicate-heavy streams, and tiles spanning many windows."""
        from radnerf_tpu.ops.hashgrid_window import sorted_table_grad_window

        rng = np.random.default_rng(0)
        for T, n, dup in [(512, 700, False), (1024, 130, False),
                          (2048, 1100, True)]:
            L = 2
            if dup:  # hammer a handful of rows (coarse-level profile)
                sk = rng.integers(0, 8, (L, n)) * (T // 8)
            else:
                sk = rng.integers(0, T, (L, n))
            sk = np.sort(sk.astype(np.int32), axis=-1)
            s0 = rng.standard_normal((L, n)).astype(np.float32)
            s1 = rng.standard_normal((L, n)).astype(np.float32)
            want = np.zeros((L, T, 2), np.float32)
            for l in range(L):
                np.add.at(want[l, :, 0], sk[l], s0[l])
                np.add.at(want[l, :, 1], sk[l], s1[l])
            got = np.asarray(
                sorted_table_grad_window(
                    jnp.asarray(sk), jnp.asarray(s0), jnp.asarray(s1), T,
                    interpret=True,
                )
            )
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
