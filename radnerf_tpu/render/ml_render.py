"""Rad-NeRF MoE rendering — the canonical entry (ml_render twin).

TPU twin of `ml_render` (reference: models/ml_rendering.py:12-78): gate the
rays, render each of the K sub-NeRFs with its own occupancy bitfield, and
gate-compose. The reference's HOT LOOP (K sequential full renders,
ml_rendering.py:47-68) becomes a single vmap over the stacked expert axis:
per-expert marching, field eval and compositing all run as one batched XLA
program, and the AABB intersection is no longer recomputed K times
(SURVEY.md §8 quirk 8).

Composition (ml_rendering.py:65-78): rgb = sum_k g_k * rgb_k, depth kept as
an (N, K) matrix (for the depth-mutual loss), opacity = sum_k g_k * o_k;
returns gating_code / gating_importance / independent_rgbs, plus per-expert
ws/deltas/ts/valid so the distortion loss can actually be wired
(the reference's renderer never produced those keys — quirk 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import functools

from ..models.gates import apply_ray_gate
from ..models.mlp import apply_mlp, slice_stacked
from ..models.mngp import MNGPConfig, _encode, expert_forward_fn
from ..ops.compositing import composite_train, composite_train_flat
from ..ops.intersection import scene_near_far
from ..ops.marching import (
    march_rays_train,
    march_rays_train_flat,
    march_rays_union_flat,
)
from ..ops.sh import sh_encode_dir
from ..ops.trunc_exp import trunc_exp
from ..models.ngp import scene_center_half
from .render import (
    NEAR_DISTANCE,
    RenderConfig,
    background_color,
    render_test,
    render_train,
)


def _stack_results(results: list) -> dict:
    """Stack a list of per-expert result dicts on a leading (K, ...) axis."""
    return {
        k: jnp.stack([r[k] for r in results]) for k in results[0]
    }


def _gate_input(rays_o, rays_d, imgs_d, gate_type: str) -> jnp.ndarray:
    """gate_type 'ray': origin ‖ direction; 'image': origin ‖ mean image
    direction (ml_rendering.py:31-36)."""
    if gate_type == "image":
        return jnp.concatenate([rays_o, imgs_d], axis=1)
    return jnp.concatenate([rays_o, rays_d], axis=1)


def _expert_samples_union_flat(
    params, state, cfg: MNGPConfig, rays_o, rays_d, t1, t2, mcfg, rcfg,
    d_enc_ray, k_noise, k_bg, noise=None,
) -> dict:
    """Union-of-experts sampling: ONE march + ONE hash encode for all K
    experts (see ops.marching.march_rays_union_flat for semantics).

    The per-expert render of sample b is recovered exactly by masking sigma
    to that expert's membership: a non-member sample has alpha = 0 and so
    contributes nothing and leaves transmittance untouched — identical to it
    never having been marched (volumerendering.cu:28-44 semantics). Cuts the
    dominant cost (the shared hash encode, networks.py:234-247) by ~K x.
    """
    K, N = cfg.n_experts, rays_o.shape[0]
    if noise is None:
        noise = jax.random.uniform(k_noise, (N,))
    m, member = march_rays_union_flat(
        rays_o, rays_d, t1, t2, state["occ"], mcfg, noise,
        budget_per_ray=max(
            1, round(rcfg.budget_per_ray
                     * (rcfg.union_budget_factor or K))
        ),
        cap_scale=K,   # per-ray cap stays expert-equivalent (free clamp)
    )
    rid = m["ray_id"]                                    # (B,)
    o = jnp.take(rays_o, rid, axis=0)
    d = jnp.take(rays_d, rid, axis=0)
    xyz = o + m["ts"][:, None] * d                       # (B, 3)
    d_enc = jnp.take(d_enc_ray, rid, axis=0)             # (B, sh)

    feat = _encode(params, state, cfg, xyz)              # ONCE for all K
    h = jax.vmap(
        lambda p: apply_mlp(p, feat, compute_dtype=cfg.cdtype)
    )(params["geo"])                                     # (K, B, 1+geo_out)
    sigmas = jnp.where(member, trunc_exp(h[..., 0]), 0.0)
    rgb_in = jnp.concatenate(
        [jnp.broadcast_to(d_enc[None], (K,) + d_enc.shape), h[..., 1:]],
        axis=-1,
    )
    rgbs = jax.vmap(
        lambda p, f: apply_mlp(
            p, f, out_act=cfg.rgb_act.lower(), compute_dtype=cfg.cdtype
        )
    )(params["rgb"], rgb_in).astype(jnp.float32)         # (K, B, 3)

    out = jax.vmap(
        lambda s_k, r_k, v_k: composite_train_flat(
            s_k, r_k, m["deltas"], m["ts"], rid, m["offsets"], m["cap"],
            v_k, T_threshold=rcfg.T_threshold,
        )
    )(sigmas, rgbs, member)

    bgs = jax.vmap(lambda kk: background_color(rcfg, kk))(
        jax.random.split(k_bg, K)
    )
    rgb = out["rgb"] + bgs[:, None, :] * (1.0 - out["opacity"][..., None])

    def rep(a):  # shared union arrays -> per-expert (K, ...) interface
        return jnp.broadcast_to(a[None], (K,) + a.shape)

    return {
        "rgb": rgb,
        "depth": out["depth"],
        "opacity": out["opacity"],
        "ws": out["ws"],
        "ts": rep(m["ts"]),
        "deltas": rep(m["deltas"]),
        "valid": member,
        "ray_id": rep(rid),
        "offsets": rep(m["offsets"]),
        "cap": rep(m["cap"]),
        "n_samples": rep(m["n_samples"]),
        "rm_samples": jnp.sum(member.astype(jnp.int32)),
        "budget_util": m["total"].astype(jnp.float32) / m["ts"].shape[0],
        "total_samples": jnp.sum(out["vr_samples"]),
    }


def _expert_samples_shared(
    params, state, cfg: MNGPConfig, rays_o, rays_d, key, rcfg: RenderConfig,
    noise=None,
) -> dict:
    """March every expert, then run ONE hash encode over the union of all
    experts' samples (the encoder is shared, networks.py:234-247) and
    vmapped per-expert MLPs + compositing.

    This is the batched-gated-mixture core: the reference's sequential K
    full renders (ml_rendering.py:47-68) collapse into one XLA program with
    a single sort+scatter pipeline through the hash table — K times fewer
    kernel launches and a fraction of the compile surface of an unrolled
    expert loop.
    """
    K, N = cfg.n_experts, rays_o.shape[0]
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(rays_o, rays_d, center, half, NEAR_DISTANCE)
    mcfg = rcfg.march(cfg)
    k_noise, k_bg = jax.random.split(key)
    if noise is None:
        noises = jax.random.uniform(k_noise, (K, N))
    else:
        # device-count-invariant override: per-expert jitter as cyclic
        # shifts of the per-ray uniform (stratified & decorrelated)
        noises = jnp.mod(
            noise[None, :] + jnp.arange(K, dtype=jnp.float32)[:, None] / K,
            1.0,
        )
    d_enc_ray = sh_encode_dir(rays_d, cfg.sh_degree).astype(cfg.cdtype)

    if rcfg.layout == "flat" and rcfg.union_sampling:
        return _expert_samples_union_flat(
            params, state, cfg, rays_o, rays_d, t1, t2, mcfg, rcfg,
            d_enc_ray, k_noise, k_bg, noise=noise,
        )
    if rcfg.layout == "flat":
        march = jax.vmap(
            lambda occ_k, nz: march_rays_train_flat(
                rays_o, rays_d, t1, t2, occ_k, mcfg, nz,
                budget_per_ray=rcfg.budget_per_ray,
            )
        )
        m = march(state["occ"], noises)          # leaves (K, B) / (K, N)
        rid = m["ray_id"]
        o = jnp.take(rays_o, rid.reshape(-1), axis=0)
        d = jnp.take(rays_d, rid.reshape(-1), axis=0)
        xyz = o + m["ts"].reshape(-1)[:, None] * d      # (K*B, 3)
        d_enc = jnp.take(d_enc_ray, rid.reshape(-1), axis=0)
        P = rid.shape[1]
    else:
        march = jax.vmap(
            lambda occ_k, nz: march_rays_train(
                rays_o, rays_d, t1, t2, occ_k, mcfg, nz
            )
        )
        m = march(state["occ"], noises)       # ts/deltas/valid (K, N, S)
        S = mcfg.samples_per_ray
        xyz = (
            rays_o[None, :, None, :]
            + m["ts"][..., None] * rays_d[None, :, None, :]
        ).reshape(-1, 3)                                 # (K*N*S, 3)
        d_enc = jnp.broadcast_to(
            d_enc_ray[None, :, None, :],
            (K, N, S, d_enc_ray.shape[-1]),
        ).reshape(K * N * S, -1)
        P = N * S

    feat = _encode(params, state, cfg, xyz).reshape(K, P, -1)
    h = jax.vmap(
        lambda p, f: apply_mlp(p, f, compute_dtype=cfg.cdtype)
    )(params["geo"], feat)                               # (K, P, 1+geo_out)
    sigmas = trunc_exp(h[..., 0])
    rgb_in = jnp.concatenate(
        [d_enc.reshape(K, P, -1), h[..., 1:]], axis=-1
    )
    rgbs = jax.vmap(
        lambda p, f: apply_mlp(
            p, f, out_act=cfg.rgb_act.lower(), compute_dtype=cfg.cdtype
        )
    )(params["rgb"], rgb_in).astype(jnp.float32)         # (K, P, 3)

    if rcfg.layout == "flat":
        out = jax.vmap(
            functools.partial(
                composite_train_flat, T_threshold=rcfg.T_threshold
            )
        )(
            sigmas, rgbs, m["deltas"], m["ts"], m["ray_id"], m["offsets"],
            m["cap"], m["valid"],
        )
        extra = {
            "ray_id": m["ray_id"], "offsets": m["offsets"], "cap": m["cap"],
            "rm_samples": jnp.sum(m["total"]),
        }
    else:
        sigmas = sigmas.reshape(K, N, S)
        rgbs = rgbs.reshape(K, N, S, 3)
        out = jax.vmap(
            functools.partial(composite_train, T_threshold=rcfg.T_threshold)
        )(sigmas, rgbs, m["deltas"], m["ts"], m["valid"])
        extra = {"rm_samples": jnp.sum(m["n_samples"])}

    # per-expert random background, as K independent renders would draw
    bgs = jax.vmap(lambda kk: background_color(rcfg, kk))(
        jax.random.split(k_bg, K)
    )
    rgb = out["rgb"] + bgs[:, None, :] * (1.0 - out["opacity"][..., None])
    return {
        "rgb": rgb,
        "depth": out["depth"],
        "opacity": out["opacity"],
        "ws": out["ws"],
        "ts": m["ts"],
        "deltas": m["deltas"],
        "valid": m["valid"],
        "n_samples": m["n_samples"],
        "total_samples": jnp.sum(out["vr_samples"]),
        **extra,
    }


def ml_render_train(
    params: dict,
    state: dict,
    cfg: MNGPConfig,
    gate_params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    imgs_d: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
    gate_type: str = "ray",
    noise: jnp.ndarray | None = None,
) -> dict:
    K = cfg.n_experts
    gate, importance, _ = apply_ray_gate(
        gate_params, _gate_input(rays_o, rays_d, imgs_d, gate_type),
        compute_dtype=cfg.cdtype,
    )
    keys = jax.random.split(key, K)

    if cfg.shared_encoder:
        res = _expert_samples_shared(
            params, state, cfg, rays_o, rays_d, key, rcfg, noise=noise
        )
    else:

        def render_one(geo_k, rgb_k, table_k, occ_k, key_k, k=0):
            fwd = expert_forward_fn(table_k, geo_k, rgb_k, state, cfg)
            sub_state = {**state, "occ": occ_k}
            nz = None if noise is None else jnp.mod(noise + k / K, 1.0)
            return render_train(
                None, sub_state, cfg, rays_o, rays_d, key_k, rcfg,
                forward_fn=fwd, noise=nz,
            )

        # unshared_MNGP: per-expert hash tables -> statically-unrolled
        # expert loop (K is 2-5); XLA parallelizes the branches
        res = _stack_results(
            [
                render_one(
                    slice_stacked(params["geo"], k),
                    slice_stacked(params["rgb"], k),
                    params["hash_table"][k],
                    state["occ"][k],
                    keys[k],
                    k=k,
                )
                for k in range(K)
            ]
        )

    rgb = jnp.einsum("nk,knc->nc", gate, res["rgb"])
    opacity = jnp.einsum("nk,kn->n", gate, res["opacity"])
    depth = jnp.transpose(res["depth"])  # (N, K)
    return {
        "rgb": rgb,
        "depth": depth,
        "opacity": opacity,
        "gating_code": gate,
        "gating_importance": importance,
        "independent_rgbs": res["rgb"],          # (K, N, 3)
        "ws": res["ws"],                          # (K, N, S)
        "deltas": res["deltas"],
        "ts": res["ts"],
        "valid": res["valid"],
        "rm_samples": jnp.sum(res["rm_samples"]),
        "budget_util": jnp.mean(res["budget_util"])
        if "budget_util" in res else jnp.asarray(0.0),
        "total_samples": jnp.sum(res["total_samples"]),
    }


def _ml_test_union_flat(
    params, state, cfg: MNGPConfig, rays_o, rays_d, rcfg: RenderConfig
) -> dict:
    """Union-of-experts TEST rendering: per while-loop iteration, ONE flat
    march against the union occupancy grid and ONE shared hash encode
    serve all K experts (the test-time twin of
    _expert_samples_union_flat). The march cursor is SHARED — an expert
    only ever skips non-member samples (alpha 0), so all experts consume
    the same candidate window; each keeps its own resumable
    (T, rgb, depth, opacity, alive) carry. K x fewer marches and encodes
    than the vmapped per-expert loop."""
    import math as _math

    from ..ops.compositing import composite_test_flat
    from ..ops.marching import march_rays_test_flat, occupancy_lookup

    K, N = cfg.n_experts, rays_o.shape[0]
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(rays_o, rays_d, center, half, NEAR_DISTANCE)
    mcfg = rcfg.march(cfg)
    occ_union = jnp.any(state["occ"], axis=0)
    d_enc_ray = sh_encode_dir(rays_d, cfg.sh_degree).astype(cfg.cdtype)
    S = rcfg.test_block_samples
    budget = rcfg.test_budget_per_ray
    # per-ray samples_done retirement bounds real progress; max_iters is
    # a safety valve (see _render_test_flat for the progress argument)
    max_iters = min(
        N * (rcfg.max_samples
             + int(_math.ceil(mcfg.k_candidates / rcfg.test_k_block))),
        2**31 - 2,
    )

    def expert_acc():
        return {
            "opacity": jnp.zeros((K, N)),
            "depth": jnp.zeros((K, N)),
            "rgb": jnp.zeros((K, N, 3)),
            "transmittance": jnp.ones((K, N)),
            "alive": jnp.broadcast_to((t1 >= 0)[None], (K, N)),
        }

    init = {
        "cursor": t1,
        "acc": expert_acc(),
        "samples_done": jnp.zeros((N,), jnp.int32),
        "i": jnp.asarray(0),
        "total_samples": jnp.asarray(0),
    }

    def cond(carry):
        union_alive = jnp.any(carry["acc"]["alive"], axis=0)
        return (carry["i"] < max_iters) & jnp.any(
            union_alive & (carry["cursor"] < t2)
        )

    def body(carry):
        union_alive = jnp.any(carry["acc"]["alive"], axis=0)
        m = march_rays_test_flat(
            rays_o, rays_d, carry["cursor"], t2, occ_union, mcfg,
            union_alive, k_block=rcfg.test_k_block, cap_per_ray=S,
            budget_per_ray=budget,
        )
        rid = m["ray_id"]
        o = jnp.take(rays_o, rid, axis=0)
        d = jnp.take(rays_d, rid, axis=0)
        xyz = o + m["ts"][:, None] * d
        d_enc = jnp.take(d_enc_ray, rid, axis=0)

        member = jax.vmap(
            lambda occ_k: occupancy_lookup(xyz, m["deltas"], occ_k, mcfg)
        )(state["occ"]) & m["valid"][None, :]

        feat = _encode(params, state, cfg, xyz)          # ONCE for all K
        h = jax.vmap(
            lambda p: apply_mlp(p, feat, compute_dtype=cfg.cdtype)
        )(params["geo"])
        sigmas = jnp.where(member, trunc_exp(h[..., 0]), 0.0)
        rgb_in = jnp.concatenate(
            [jnp.broadcast_to(d_enc[None], (K,) + d_enc.shape),
             h[..., 1:]],
            axis=-1,
        )
        rgbs = jax.vmap(
            lambda p, f: apply_mlp(
                p, f, out_act=cfg.rgb_act.lower(), compute_dtype=cfg.cdtype
            )
        )(params["rgb"], rgb_in).astype(jnp.float32)

        acc = jax.vmap(
            lambda s_k, r_k, mem_k, acc_k: composite_test_flat(
                s_k, r_k, m["deltas"], m["ts"], rid, m["offsets"],
                m["cap"], mem_k, acc_k, rcfg.T_threshold,
            )
        )(sigmas, rgbs, member, carry["acc"])
        samples_done = carry["samples_done"] + m["consumed"]
        acc["alive"] = acc["alive"] & (
            samples_done < rcfg.max_samples
        )[None, :]
        return {
            "cursor": m["new_cursor"],
            "acc": acc,
            "samples_done": samples_done,
            "i": carry["i"] + 1,
            "total_samples": carry["total_samples"]
            + jnp.sum(m["consumed"]),
        }

    carry = jax.lax.while_loop(cond, body, init)
    acc = carry["acc"]
    rgb_bg = background_color(rcfg, None)
    rgb = acc["rgb"] + rgb_bg * (1.0 - acc["opacity"][..., None])
    return {
        "rgb": rgb,                                      # (K, N, 3)
        "depth": acc["depth"],
        "opacity": acc["opacity"],
        "total_samples": carry["total_samples"],
    }


def ml_render_test(
    params: dict,
    state: dict,
    cfg: MNGPConfig,
    gate_params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    imgs_d: jnp.ndarray,
    rcfg: RenderConfig,
    gate_type: str = "ray",
) -> dict:
    """Test-time MoE render (ml_rendering.py:82-155 under the K loop)."""
    gate, importance, _ = apply_ray_gate(
        gate_params, _gate_input(rays_o, rays_d, imgs_d, gate_type),
        compute_dtype=cfg.cdtype,
    )

    def render_one(geo_k, rgb_k, table_k, occ_k):
        fwd = expert_forward_fn(table_k, geo_k, rgb_k, state, cfg)
        sub_state = {**state, "occ": occ_k}
        return render_test(
            None, sub_state, cfg, rays_o, rays_d, rcfg, forward_fn=fwd
        )

    if (
        cfg.shared_encoder
        and rcfg.union_sampling
        and rcfg.test_layout == "flat"
    ):
        # ONE march + ONE shared encode per iteration for all K experts
        res = _ml_test_union_flat(params, state, cfg, rays_o, rays_d, rcfg)
    elif cfg.shared_encoder:
        # vmap over the stacked expert axis (lockstep while_loop): one
        # compiled expert graph instead of K unrolled copies
        res = jax.vmap(
            lambda geo_k, rgb_k, occ_k: render_one(
                geo_k, rgb_k, params["hash_table"], occ_k
            )
        )(params["geo"], params["rgb"], state["occ"])
    else:
        res = _stack_results(
            [
                render_one(
                    slice_stacked(params["geo"], k),
                    slice_stacked(params["rgb"], k),
                    params["hash_table"][k],
                    state["occ"][k],
                )
                for k in range(cfg.n_experts)
            ]
        )

    rgb = jnp.einsum("nk,knc->nc", gate, res["rgb"])
    opacity = jnp.einsum("nk,kn->n", gate, res["opacity"])
    depth = jnp.transpose(res["depth"])
    return {
        "rgb": rgb,
        "depth": depth,
        "opacity": opacity,
        "gating_code": gate,
        "gating_importance": importance,
        "independent_rgbs": res["rgb"],
        "total_samples": jnp.sum(res["total_samples"]),
    }
