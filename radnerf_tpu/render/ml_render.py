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

from ..models.gates import apply_ray_gate
from ..models.mlp import slice_stacked
from ..models.mngp import MNGPConfig, expert_forward_fn
from .render import RenderConfig, render_test, render_train


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
) -> dict:
    K = cfg.n_experts
    gate, importance, _ = apply_ray_gate(
        gate_params, _gate_input(rays_o, rays_d, imgs_d, gate_type),
        compute_dtype=cfg.cdtype,
    )
    keys = jax.random.split(key, K)

    def render_one(geo_k, rgb_k, table_k, occ_k, key_k):
        fwd = expert_forward_fn(table_k, geo_k, rgb_k, state, cfg)
        sub_state = {**state, "occ": occ_k}
        return render_train(
            None, sub_state, cfg, rays_o, rays_d, key_k, rcfg,
            forward_fn=fwd,
        )

    # statically-unrolled expert loop (K is 2-5). A vmap would be prettier,
    # but the Pallas hash-grid backward cannot be batched (Mosaic rejects
    # the extra dim), and XLA parallelizes the unrolled branches anyway.
    res = _stack_results(
        [
            render_one(
                slice_stacked(params["geo"], k),
                slice_stacked(params["rgb"], k),
                params["hash_table"]
                if cfg.shared_encoder else params["hash_table"][k],
                state["occ"][k],
                keys[k],
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
        "total_samples": jnp.sum(res["total_samples"]),
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

    res = _stack_results(
        [
            render_one(
                slice_stacked(params["geo"], k),
                slice_stacked(params["rgb"], k),
                params["hash_table"]
                if cfg.shared_encoder else params["hash_table"][k],
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
