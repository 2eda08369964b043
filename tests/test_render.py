"""Render-layer tests.

Golden analytic scene: constant density + constant color inside the whole
bbox has a closed-form render
    opacity = 1 - exp(-sigma * (t2 - t1)),  rgb = c*opacity + bg*(1-opacity)
which the discretized compositor must approach as dt -> 0. This replaces
bit-parity with the CUDA reference (not runnable here) with math-parity
(SURVEY.md §4 consequence 2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radnerf_tpu.models.ngp import NGPConfig, init_ngp_state
from radnerf_tpu.models.mngp import MNGPConfig, init_mngp, init_mngp_state
from radnerf_tpu.models.gates import init_ray_gate
from radnerf_tpu.render.render import (
    RenderConfig,
    render_train,
    render_test,
)
from radnerf_tpu.render.ml_render import ml_render_train, ml_render_test
from radnerf_tpu.ops.intersection import scene_near_far


SIGMA0 = 2.0
COLOR0 = np.array([0.2, 0.5, 0.8], np.float32)


def const_forward(x, d):
    n = x.shape[0]
    return (
        jnp.full((n,), SIGMA0),
        jnp.broadcast_to(jnp.asarray(COLOR0), (n, 3)),
    )


def make_rays(n=64, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -1.5 * scale - 0.5
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestGoldenConstantScene:
    def _closed_form(self, state, rays_o, rays_d):
        center = jnp.zeros(3)
        half = jnp.full(3, 0.5)
        t1, t2 = scene_near_far(rays_o, rays_d, center, half)
        op = np.where(
            np.asarray(t1) >= 0,
            1.0 - np.exp(-SIGMA0 * np.asarray(t2 - t1)),
            0.0,
        )
        return op

    def test_train_render_matches_closed_form(self):
        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays()
        rcfg = RenderConfig(samples_per_ray=768)
        out = render_train(
            None, state, cfg, rays_o, rays_d, jax.random.PRNGKey(0), rcfg,
            forward_fn=const_forward,
        )
        op_ref = self._closed_form(state, rays_o, rays_d)
        np.testing.assert_allclose(
            np.asarray(out["opacity"]), op_ref, atol=5e-3
        )
        # bg is white (synthetic): rgb = c*op + 1*(1-op)
        rgb_ref = COLOR0[None] * op_ref[:, None] + (1 - op_ref[:, None])
        np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref, atol=6e-3)

    def test_test_render_matches_train_render(self):
        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays(n=32, seed=1)
        rcfg = RenderConfig(samples_per_ray=768)
        tr = render_train(
            None, state, cfg, rays_o, rays_d, jax.random.PRNGKey(0), rcfg,
            forward_fn=const_forward,
        )
        te = render_test(
            None, state, cfg, rays_o, rays_d, rcfg, forward_fn=const_forward
        )
        # train has start jitter -> small tolerance
        np.testing.assert_allclose(
            np.asarray(te["opacity"]), np.asarray(tr["opacity"]), atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(te["rgb"]), np.asarray(tr["rgb"]), atol=1e-2
        )

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_depth_is_gated_expectation(self):
        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays(n=16, seed=2)
        rcfg = RenderConfig(samples_per_ray=768)
        out = render_train(
            None, state, cfg, rays_o, rays_d, jax.random.PRNGKey(0), rcfg,
            forward_fn=const_forward,
        )
        # E[depth] for constant sigma: int_t1^t2 t sig e^{-sig (t-t1)} dt
        t1, t2 = scene_near_far(rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5))
        a, b = np.asarray(t1), np.asarray(t2)
        s = SIGMA0
        ref = (a + 1 / s) - np.exp(-s * (b - a)) * (b + 1 / s)
        np.testing.assert_allclose(np.asarray(out["depth"]), ref, atol=5e-3)


class TestMoERender:
    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_ml_render_shapes_and_composition(self):
        cfg = MNGPConfig(
            scale=0.5, grid_size=16, n_levels=4, log2_T=8, n_experts=2
        )
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        state = init_mngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        gate_p = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
        rays_o, rays_d = make_rays(n=32)
        rcfg = RenderConfig(samples_per_ray=64)
        out = ml_render_train(
            params, state, cfg, gate_p, rays_o, rays_d, rays_d,
            jax.random.PRNGKey(2), rcfg,
        )
        N, K = 32, 2
        assert out["rgb"].shape == (N, 3)
        assert out["depth"].shape == (N, K)
        assert out["gating_code"].shape == (N, K)
        assert out["independent_rgbs"].shape == (K, N, 3)
        # composition identity: rgb == sum_k g_k * rgb_k
        comp = np.einsum(
            "nk,knc->nc",
            np.asarray(out["gating_code"]),
            np.asarray(out["independent_rgbs"]),
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), comp, rtol=1e-4,
                                   atol=1e-5)

    def test_ml_render_test_runs(self):
        cfg = MNGPConfig(
            scale=0.5, grid_size=16, n_levels=4, log2_T=8, n_experts=2
        )
        params = init_mngp(jax.random.PRNGKey(0), cfg)
        state = init_mngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        gate_p = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
        rays_o, rays_d = make_rays(n=16)
        rcfg = RenderConfig(samples_per_ray=64, test_block_samples=16,
                            test_k_block=64)
        out = ml_render_test(
            params, state, cfg, gate_p, rays_o, rays_d, rays_d, rcfg
        )
        assert out["rgb"].shape == (16, 3)
        assert bool(jnp.all(out["opacity"] >= -1e-6))


class TestLosses:
    def test_loss_dict(self):
        from radnerf_tpu.losses import nerf_loss, total_loss

        N, K, S = 8, 2, 4
        rng = np.random.default_rng(0)
        results = {
            "rgb": jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
            "opacity": jnp.asarray(
                rng.uniform(0, 1, (N,)).astype(np.float32)
            ),
            "depth": jnp.asarray(rng.uniform(0, 2, (N, K)).astype(np.float32)),
            "gating_code": jax.nn.softmax(
                jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
            ),
            "gating_importance": jnp.asarray([3.0, 5.0]),
            "ws": jnp.asarray(
                rng.uniform(0, 0.1, (K, N, S)).astype(np.float32)
            ),
            "deltas": jnp.full((K, N, S), 0.01),
            "ts": jnp.asarray(
                np.cumsum(np.full((K, N, S), 0.01), -1).astype(np.float32)
            ),
            "valid": jnp.ones((K, N, S), bool),
        }
        target = {"rgb": jnp.zeros((N, 3))}
        ld = nerf_loss(
            results, target, lambda_opacity=1e-3, lambda_distortion=1e-3,
            lambda_cv_importance=1e-2, lambda_depth_mutual=5e-3,
        )
        for k in ("rgb", "opacity", "distortion", "cv_importance",
                  "depth_mutual"):
            assert k in ld, k
        tot = total_loss(ld)
        assert np.isfinite(float(tot))
        # cv^2 check: var/mean^2 of [3,5]
        imp = np.array([3.0, 5.0])
        want = 1e-2 * imp.var() / imp.mean() ** 2
        np.testing.assert_allclose(
            float(jnp.mean(ld["cv_importance"])), want, rtol=1e-5
        )


class TestCompactedTestRender:
    def test_matches_uncompacted(self):
        """render_test_compacted (host-side alive-ray compaction between
        while-loop phases) must produce the same image as render_test —
        compaction only moves dead rays out of the lanes."""
        from radnerf_tpu.render.render import render_test_compacted

        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays(n=53, seed=5)   # odd N: exercises pads
        rcfg = RenderConfig(samples_per_ray=768)
        ref = render_test(
            None, state, cfg, rays_o, rays_d, rcfg, forward_fn=const_forward
        )
        out = render_test_compacted(
            None, state, cfg, rays_o, rays_d, rcfg,
            forward_fn=const_forward, phase_iters=2,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["opacity"]), np.asarray(ref["opacity"]),
            atol=1e-5,
        )
        assert int(out["total_samples"]) <= int(ref["total_samples"])


class TestFlatTestRender:
    def test_flat_matches_dense_layout(self):
        """The flat test path (budget redistribution, cursor resume) must
        match the dense masked-lane path — same lattice, same compositing
        semantics, different sample bookkeeping."""
        import dataclasses

        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays(n=41, seed=9)
        flat_cfg = RenderConfig(samples_per_ray=768, test_layout="flat",
                                test_budget_per_ray=16)
        dense_cfg = dataclasses.replace(flat_cfg, test_layout="dense")
        fl = render_test(
            None, state, cfg, rays_o, rays_d, flat_cfg,
            forward_fn=const_forward,
        )
        de = render_test(
            None, state, cfg, rays_o, rays_d, dense_cfg,
            forward_fn=const_forward,
        )
        np.testing.assert_allclose(
            np.asarray(fl["rgb"]), np.asarray(de["rgb"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(fl["opacity"]), np.asarray(de["opacity"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(fl["depth"]), np.asarray(de["depth"]), atol=2e-3
        )

    def test_flat_matches_dense_under_buffer_saturation(self):
        """Skewed per-ray keep counts force sum(cap) > B (the min-1-cap
        bump under saturation): rays whose granted slots spill past the
        buffer end must NOT advance their cursor past unconsumed samples
        (and must not re-composite consumed ones). Regression for the
        flat-cursor mis-advance (ADVICE r3 high)."""
        import dataclasses

        from radnerf_tpu.ops.intersection import scene_near_far
        from radnerf_tpu.ops.marching import march_rays_test_flat

        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        # heavy half-space (x<0): fully occupied columns (~14 kept samples
        # per window at dt = sqrt(3)/24); light half-space (x>=0): only the
        # first z-cell occupied (exactly 1 kept sample per ray)
        occ = np.zeros((cfg.cascades, 16, 16, 16), bool)
        occ[:, :8, :, :] = True
        occ[:, 8:, :, 0] = True
        state = {**state, "occ": jnp.asarray(occ)}

        rng = np.random.default_rng(3)
        xs = np.concatenate([
            np.linspace(-0.45, -0.05, 8),        # 8 heavy rays
            np.linspace(0.05, 0.45, 56),         # 56 light rays
        ]).astype(np.float32)
        xs = xs[rng.permutation(64)]
        o = np.stack([xs, np.zeros(64, np.float32),
                      np.full(64, -1.0, np.float32)], axis=1)
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (64, 1))
        rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)

        flat_cfg = RenderConfig(
            max_samples=24, test_layout="flat", test_budget_per_ray=1,
        )
        dense_cfg = dataclasses.replace(flat_cfg, test_layout="dense")
        mcfg = flat_cfg.march(cfg)

        # guard: the first window really does overflow the flat buffer
        t1, t2 = scene_near_far(rays_o, rays_d, jnp.zeros(3),
                                jnp.full(3, 0.5))
        m0 = march_rays_test_flat(
            rays_o, rays_d, t1, t2, state["occ"], mcfg, t1 >= 0,
            k_block=flat_cfg.test_k_block,
            cap_per_ray=flat_cfg.test_block_samples, budget_per_ray=1,
        )
        B = 64 * 1
        assert int(jnp.sum(m0["cap"])) > B, "fixture no longer saturates"
        assert int(jnp.sum(m0["consumed"])) <= B

        fl = render_test(
            None, state, cfg, rays_o, rays_d, flat_cfg,
            forward_fn=const_forward,
        )
        de = render_test(
            None, state, cfg, rays_o, rays_d, dense_cfg,
            forward_fn=const_forward,
        )
        np.testing.assert_allclose(
            np.asarray(fl["opacity"]), np.asarray(de["opacity"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(fl["rgb"]), np.asarray(de["rgb"]), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(fl["depth"]), np.asarray(de["depth"]), atol=2e-3
        )
