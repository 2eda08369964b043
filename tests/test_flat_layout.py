"""Flat (static-CSR) layout equivalence: marching, compositing and the
end-to-end render must match the dense (N, S) layout when the budget is
not binding, and degrade gracefully (front-truncation) when it is."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radnerf_tpu.models.ngp import NGPConfig, init_ngp_state
from radnerf_tpu.ops.compositing import segmented_cumsum
from radnerf_tpu.ops.distortion import distortion_loss, distortion_loss_flat
from radnerf_tpu.render.render import RenderConfig, render_train

from .test_render import COLOR0, SIGMA0, const_forward, make_rays


class TestSegmentedCumsum:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal(64).astype(np.float32)
        starts = np.zeros(64, bool)
        starts[[0, 10, 11, 40]] = True
        got = np.asarray(
            segmented_cumsum(jnp.asarray(v), jnp.asarray(starts))
        )
        want = np.empty_like(v)
        acc = 0.0
        for i in range(64):
            acc = v[i] if starts[i] else acc + v[i]
            want[i] = acc
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_2d(self):
        v = jnp.ones((8, 3))
        starts = jnp.asarray([1, 0, 0, 1, 0, 0, 0, 1], bool)
        out = np.asarray(segmented_cumsum(v, starts))
        np.testing.assert_allclose(out[:, 0], [1, 2, 3, 1, 2, 3, 4, 1])


class TestFlatRender:
    def _setup(self):
        cfg = NGPConfig(scale=0.5, grid_size=16)
        state = init_ngp_state(cfg)
        state = {**state, "occ": jnp.ones_like(state["occ"])}
        rays_o, rays_d = make_rays(n=32, seed=4)
        return cfg, state, rays_o, rays_d

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_matches_dense_when_budget_ample(self):
        cfg, state, rays_o, rays_d = self._setup()
        key = jax.random.PRNGKey(0)
        dense = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="dense"),
            forward_fn=const_forward,
        )
        flat = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="flat",
                         budget_per_ray=1024),
            forward_fn=const_forward,
        )
        np.testing.assert_allclose(
            np.asarray(flat["opacity"]), np.asarray(dense["opacity"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(flat["rgb"]), np.asarray(dense["rgb"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(flat["depth"]), np.asarray(dense["depth"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(flat["n_samples"]), np.asarray(dense["n_samples"])
        )

    def test_budget_truncation_is_fair(self):
        cfg, state, rays_o, rays_d = self._setup()
        key = jax.random.PRNGKey(0)
        flat = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="flat",
                         budget_per_ray=32),
            forward_fn=const_forward,
        )
        dense = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="dense"),
            forward_fn=const_forward,
        )
        cap = np.asarray(flat["cap"])
        hit = np.asarray(dense["n_samples"]) > 0
        assert (cap[hit] > 0).all()  # every hitting ray keeps samples
        assert cap.sum() <= 32 * 32 + hit.sum()  # bounded overflow
        # outputs still sane
        assert np.isfinite(np.asarray(flat["rgb"])).all()

    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_grads_flow(self):
        cfg, state, rays_o, rays_d = self._setup()

        def loss(s0):
            def fwd(x, d):
                n = x.shape[0]
                return jnp.full((n,), s0), jnp.broadcast_to(
                    jnp.asarray(COLOR0), (n, 3)
                )

            out = render_train(
                None, state, cfg, rays_o, rays_d, jax.random.PRNGKey(0),
                RenderConfig(samples_per_ray=256, layout="flat",
                             budget_per_ray=64),
                forward_fn=fwd,
            )
            return out["opacity"].sum()

        g = float(jax.grad(loss)(SIGMA0))
        # increasing sigma increases opacity
        assert g > 0

    def test_flat_distortion_matches_dense(self):
        cfg, state, rays_o, rays_d = self._setup()
        key = jax.random.PRNGKey(0)
        dense = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="dense"),
            forward_fn=const_forward,
        )
        flat = render_train(
            None, state, cfg, rays_o, rays_d, key,
            RenderConfig(samples_per_ray=768, layout="flat",
                         budget_per_ray=1024),
            forward_fn=const_forward,
        )
        ld = distortion_loss(
            dense["ws"], dense["deltas"], dense["ts"], dense["valid"]
        )
        lf = distortion_loss_flat(
            flat["ws"], flat["deltas"], flat["ts"], flat["ray_id"],
            flat["offsets"], flat["cap"], flat["valid"],
        )
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=1e-3, atol=1e-6
        )
