"""MoE union-of-experts sampling equivalence.

`march_rays_union_flat` + membership-masked compositing must reproduce each
expert's INDEPENDENT flat render exactly (same shared start jitter): a
non-member sample has sigma masked to 0, so alpha = 0 and it neither
contributes nor attenuates — identical to never having been marched
(volumerendering.cu:28-44 semantics). Budgets are kept slack so the union
truncation rule cannot bind.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnerf_tpu.models.mlp import apply_mlp, slice_stacked
from radnerf_tpu.models.mngp import MNGPConfig, _encode, init_mngp, \
    init_mngp_state
from radnerf_tpu.ops.compositing import composite_train_flat
from radnerf_tpu.ops.intersection import scene_near_far
from radnerf_tpu.ops.marching import (
    march_rays_train_flat,
    march_rays_union_flat,
)
from radnerf_tpu.ops.sh import sh_encode_dir
from radnerf_tpu.ops.trunc_exp import trunc_exp
from radnerf_tpu.render.ml_render import _expert_samples_union_flat
from radnerf_tpu.render.render import NEAR_DISTANCE, RenderConfig

pytestmark = pytest.mark.slow  # compile-heavy: excluded from scripts/test_fast.sh


K_EXPERTS = 2


def setup(seed=0, n_rays=32):
    cfg = MNGPConfig(
        scale=0.5, grid_size=16, n_levels=4, log2_T=8,
        n_experts=K_EXPERTS,
    )
    key = jax.random.PRNGKey(seed)
    params = init_mngp(key, cfg)
    state = init_mngp_state(cfg)
    # distinct random occupancy per expert (coarse: ~60% occupied)
    occ = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), state["occ"].shape
    ) < 0.3
    state = {**state, "occ": occ}
    rng = np.random.default_rng(seed)
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 2] = -1.2
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return cfg, params, state, jnp.asarray(o), jnp.asarray(d)


def test_union_march_matches_per_expert():
    cfg, params, state, rays_o, rays_d = setup()
    rcfg = RenderConfig(layout="flat", budget_per_ray=1024, samples_per_ray=1024)
    mcfg = rcfg.march(cfg)
    t1, t2 = scene_near_far(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5), NEAR_DISTANCE
    )
    noise = jax.random.uniform(jax.random.PRNGKey(7), (rays_o.shape[0],))

    m, member = march_rays_union_flat(
        rays_o, rays_d, t1, t2, state["occ"], mcfg, noise,
        budget_per_ray=rcfg.budget_per_ray,
    )
    for k in range(K_EXPERTS):
        mk = march_rays_train_flat(
            rays_o, rays_d, t1, t2, state["occ"][k], mcfg, noise,
            budget_per_ray=rcfg.budget_per_ray,
        )
        # expert k's samples == union samples restricted to membership
        sel = np.asarray(member[k])
        got_ts = np.asarray(m["ts"])[sel]
        got_rid = np.asarray(m["ray_id"])[sel]
        want_valid = np.asarray(mk["valid"])
        want_ts = np.asarray(mk["ts"])[want_valid]
        want_rid = np.asarray(mk["ray_id"])[want_valid]
        assert got_ts.shape == want_ts.shape
        np.testing.assert_allclose(got_ts, want_ts, rtol=0, atol=0)
        np.testing.assert_array_equal(got_rid, want_rid)
        # deltas identical too (same lattice)
        np.testing.assert_allclose(
            np.asarray(m["deltas"])[sel],
            np.asarray(mk["deltas"])[want_valid],
        )


def test_union_render_matches_independent_expert_renders():
    cfg, params, state, rays_o, rays_d = setup()
    rcfg = RenderConfig(
        layout="flat", budget_per_ray=1024, samples_per_ray=1024,
        union_sampling=True,
    )
    mcfg = rcfg.march(cfg)
    t1, t2 = scene_near_far(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5), NEAR_DISTANCE
    )
    d_enc_ray = sh_encode_dir(rays_d, cfg.sh_degree).astype(cfg.cdtype)
    key = jax.random.PRNGKey(3)
    k_noise, k_bg = jax.random.split(key)
    res = _expert_samples_union_flat(
        params, state, cfg, rays_o, rays_d, t1, t2, mcfg, rcfg,
        d_enc_ray, k_noise, k_bg,
    )

    # reference: K fully independent flat renders with the same jitter
    noise = jax.random.uniform(k_noise, (rays_o.shape[0],))
    for k in range(K_EXPERTS):
        mk = march_rays_train_flat(
            rays_o, rays_d, t1, t2, state["occ"][k], mcfg, noise,
            budget_per_ray=rcfg.budget_per_ray,
        )
        rid = mk["ray_id"]
        xyz = jnp.take(rays_o, rid, axis=0) \
            + mk["ts"][:, None] * jnp.take(rays_d, rid, axis=0)
        feat = _encode(params, state, cfg, xyz)
        h = apply_mlp(
            slice_stacked(params["geo"], k), feat, compute_dtype=cfg.cdtype
        )
        sig = jnp.where(mk["valid"], trunc_exp(h[:, 0]), 0.0)
        rgb_in = jnp.concatenate(
            [jnp.take(d_enc_ray, rid, axis=0), h[:, 1:]], axis=-1
        )
        rgbs = apply_mlp(
            slice_stacked(params["rgb"], k), rgb_in,
            out_act=cfg.rgb_act.lower(), compute_dtype=cfg.cdtype,
        ).astype(jnp.float32)
        out = composite_train_flat(
            sig, rgbs, mk["deltas"], mk["ts"], rid, mk["offsets"],
            mk["cap"], mk["valid"], T_threshold=rcfg.T_threshold,
        )
        np.testing.assert_allclose(
            np.asarray(res["opacity"][k]), np.asarray(out["opacity"]),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res["depth"][k]), np.asarray(out["depth"]),
            rtol=2e-5, atol=2e-5,
        )
        # res["rgb"] includes the background blend; undo it for comparison
        bgs = jax.vmap(
            lambda kk: jnp.ones(3)
        )(jax.random.split(k_bg, K_EXPERTS))  # white bg (exp_step_factor=0)
        want = np.asarray(out["rgb"]) + np.asarray(
            bgs[k][None, :] * (1.0 - out["opacity"][:, None])
        )
        np.testing.assert_allclose(
            np.asarray(res["rgb"][k]), want, rtol=2e-5, atol=2e-5,
        )


def test_union_full_moe_render_smoke():
    """ml_render_train with union_sampling on/off: same structure, finite."""
    from radnerf_tpu.models.gates import init_ray_gate
    from radnerf_tpu.render.ml_render import ml_render_train

    cfg, params, state, rays_o, rays_d = setup()
    gate_p = init_ray_gate(jax.random.PRNGKey(9), cfg.n_experts)
    imgs_d = rays_d
    for union in (True, False):
        rcfg = RenderConfig(
            layout="flat", budget_per_ray=32, samples_per_ray=64,
            union_sampling=union,
        )
        res = ml_render_train(
            params, state, cfg, gate_p, rays_o, rays_d, imgs_d,
            jax.random.PRNGKey(11), rcfg,
        )
        assert res["rgb"].shape == (rays_o.shape[0], 3)
        assert res["depth"].shape == (rays_o.shape[0], cfg.n_experts)
        assert res["ws"].shape[0] == cfg.n_experts
        assert bool(jnp.isfinite(res["rgb"]).all())
        assert bool(jnp.isfinite(res["opacity"]).all())


def test_union_test_render_matches_per_expert():
    """Test-time union rendering (one march + one shared encode for all K
    experts, shared cursor) matches the vmapped per-expert test path on
    slack budgets."""
    import dataclasses

    import jax
    import numpy as np

    from radnerf_tpu.models.gates import init_ray_gate
    from radnerf_tpu.models.mngp import MNGPConfig, init_mngp, init_mngp_state
    from radnerf_tpu.render.ml_render import ml_render_test

    cfg = MNGPConfig(scale=0.5, grid_size=16, n_levels=4, log2_T=10,
                     n_experts=2)
    params = init_mngp(jax.random.PRNGKey(0), cfg)
    gate = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
    state = init_mngp_state(cfg)
    rng = np.random.default_rng(0)
    # differing per-expert occupancy: exercises membership masking
    occ = rng.random((cfg.n_experts, cfg.cascades, 16, 16, 16)) < 0.6
    occ[1] &= rng.random((cfg.cascades, 16, 16, 16)) < 0.8
    state = {**state, "occ": jnp.asarray(occ)}
    n = 33
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
    d = -o / 1.2
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    rcfg_union = RenderConfig(samples_per_ray=64, test_layout="flat",
                              test_budget_per_ray=32, union_sampling=True)
    rcfg_solo = dataclasses.replace(rcfg_union, union_sampling=False)
    out_u = ml_render_test(params, state, cfg, gate, o, d, d, rcfg_union)
    out_s = ml_render_test(params, state, cfg, gate, o, d, d, rcfg_solo)
    np.testing.assert_allclose(
        np.asarray(out_u["rgb"]), np.asarray(out_s["rgb"]),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_u["opacity"]), np.asarray(out_s["opacity"]),
        rtol=2e-2, atol=2e-2,
    )
