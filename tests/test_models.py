"""Model-layer tests: NGP field shapes/grads, occupancy-grid update
semantics (EMA-max decay, warmup), MNGP expert stacking, gates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radnerf_tpu.models.ngp import (
    NGPConfig,
    init_ngp,
    init_ngp_state,
    ngp_density,
    ngp_forward,
    update_density_grid,
)
from radnerf_tpu.models.mngp import (
    MNGPConfig,
    init_mngp,
    init_mngp_state,
    mngp_forward_expert,
    mngp_forward_all,
    mngp_update_density_grids,
)
from radnerf_tpu.models.gates import (
    init_ray_gate,
    apply_ray_gate,
    init_point_gate,
    apply_point_gate,
)


def tiny_cfg(**kw):
    kw.setdefault("scale", 0.5)
    kw.setdefault("grid_size", 16)
    kw.setdefault("n_levels", 4)
    kw.setdefault("log2_T", 8)
    return NGPConfig(**kw)


def tiny_mcfg(**kw):
    kw.setdefault("scale", 0.5)
    kw.setdefault("grid_size", 16)
    kw.setdefault("n_levels", 4)
    kw.setdefault("log2_T", 8)
    kw.setdefault("n_experts", 3)
    return MNGPConfig(**kw)


class TestNGP:
    def test_forward_shapes_and_range(self):
        cfg = tiny_cfg()
        params = init_ngp(jax.random.PRNGKey(0), cfg)
        state = init_ngp_state(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5,
                               maxval=0.5)
        d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
        sig, rgb = ngp_forward(params, state, cfg, x, d)
        assert sig.shape == (64,) and rgb.shape == (64, 3)
        assert bool((sig >= 0).all())
        assert bool((rgb >= 0).all() and (rgb <= 1).all())  # sigmoid

    def test_cascades(self):
        assert tiny_cfg(scale=0.5).cascades == 1
        assert NGPConfig(scale=4.0).cascades == 4
        assert NGPConfig(scale=16.0).cascades == 6

    def test_density_grad_reaches_hash_table(self):
        cfg = tiny_cfg()
        params = init_ngp(jax.random.PRNGKey(0), cfg)
        state = init_ngp_state(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.4,
                               maxval=0.4)
        g = jax.grad(
            lambda p: ngp_density(p, state, cfg, x).sum()
        )(params)
        assert float(jnp.abs(g["hash_table"]).sum()) > 0
        assert float(jnp.abs(g["geo"]["w"][0]).sum()) > 0

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_update_density_grid_warmup_and_ema(self):
        cfg = tiny_cfg()
        params = init_ngp(jax.random.PRNGKey(0), cfg)
        state = init_ngp_state(cfg)
        thresh = 0.01 * 1024 / np.sqrt(3)
        s1 = update_density_grid(
            params, state, cfg, jax.random.PRNGKey(1), thresh, warmup=True
        )
        # fresh random field: sigma = exp(small) ~ 1 > 0 everywhere
        assert float(s1["density_grid"].min()) > 0
        assert bool(s1["occ"].any())
        # EMA: after a second update the grid is >= decay * previous
        s2 = update_density_grid(
            params, s1, cfg, jax.random.PRNGKey(2), thresh, warmup=False
        )
        assert bool(
            (s2["density_grid"] >= 0.95 * s1["density_grid"] - 1e-5).all()
        )

    def test_occ_thresholds_on_mean(self):
        cfg = tiny_cfg()
        params = init_ngp(jax.random.PRNGKey(0), cfg)
        state = init_ngp_state(cfg)
        s1 = update_density_grid(
            params, state, cfg, jax.random.PRNGKey(1), 1e9, warmup=True
        )
        # threshold = min(mean_positive, 1e9) = mean -> occ where > mean
        # (fp32 on-device reduction order vs numpy float64: cells exactly at
        # the threshold may flip — allow a tiny borderline fraction)
        g = np.asarray(s1["density_grid"])
        mean = g[g > 0].mean()
        got = np.asarray(s1["occ"]).reshape(cfg.cascades, -1)
        mismatch = (got != (g > mean)).mean()
        assert mismatch < 0.01, mismatch


class TestMNGP:
    def test_expert_selection_matches_stack(self):
        cfg = tiny_mcfg()
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        state = init_mngp_state(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.4,
                               maxval=0.4)
        d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
        sig_all, rgb_all = mngp_forward_all(params, state, cfg, x, d)
        for k in range(cfg.n_experts):
            sig_k, rgb_k = mngp_forward_expert(params, state, cfg, x, d, k)
            np.testing.assert_allclose(sig_k, sig_all[k], rtol=1e-5)
            np.testing.assert_allclose(rgb_k, rgb_all[k], rtol=1e-5,
                                       atol=1e-6)

    def test_experts_differ(self):
        cfg = tiny_mcfg()
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        state = init_mngp_state(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.4,
                               maxval=0.4)
        d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        sig, _ = mngp_forward_all(params, state, cfg, x, d)
        assert float(jnp.abs(sig[0] - sig[1]).max()) > 1e-6

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_grid_update_all_experts(self):
        cfg = tiny_mcfg()
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        state = init_mngp_state(cfg)
        s1 = mngp_update_density_grids(
            params, state, cfg, jax.random.PRNGKey(1),
            0.01 * 1024 / np.sqrt(3), warmup=True,
        )
        assert s1["density_grid"].shape[0] == cfg.n_experts
        assert bool((s1["density_grid"] > 0).all())

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_unshared_variant(self):
        cfg = tiny_mcfg(shared_encoder=False, n_experts=2)
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        assert params["hash_table"].shape[0] == 2
        state = init_mngp_state(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.4,
                               maxval=0.4)
        d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        sig_all, _ = mngp_forward_all(params, state, cfg, x, d)
        sig_0, _ = mngp_forward_expert(params, state, cfg, x, d, 0)
        np.testing.assert_allclose(sig_0, sig_all[0], rtol=1e-5)


class TestGates:
    def test_ray_gate_softmax(self):
        gp = init_ray_gate(jax.random.PRNGKey(0), out_dim=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
        gate, imp, idx = apply_ray_gate(gp, x)
        assert gate.shape == (32, 4) and idx is None
        np.testing.assert_allclose(gate.sum(1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(imp, gate.sum(0), rtol=1e-6)

    def test_point_gate_top1(self):
        gp = init_point_gate(jax.random.PRNGKey(0), in_dim=32, n_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
        gate, load, idx = apply_point_gate(
            gp, x, jax.random.PRNGKey(2), k=1, train=True
        )
        assert gate.shape == (64, 4) and idx.shape == (64, 1)
        # top-1: exactly one nonzero per row, summing to 1
        nz = np.asarray(gate > 0).sum(1)
        np.testing.assert_array_equal(nz, 1)
        np.testing.assert_allclose(np.asarray(gate).sum(1), 1.0, rtol=1e-5)
        assert load.shape == (4,)

    def test_point_gate_eval_deterministic(self):
        gp = init_point_gate(jax.random.PRNGKey(0), in_dim=8, n_experts=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        g1, _, _ = apply_point_gate(gp, x, None, train=False)
        g2, _, _ = apply_point_gate(gp, x, None, train=False)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
