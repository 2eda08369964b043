"""Block-NeRF / Mega-NeRF / NGP_zoo MoE rendering.

TPU twins of `block_render` / `mega_render` (models/block_rendering.py:12-63,
mega_rendering.py — identical twins) and `moe_render`
(models/rendering.py:49-110, the NGP_zoo path).

block/mega: the K submodels share density (and the occupancy grid); only the
rgb head differs, and the caller supplies the `gating_code` (spatial
assignment). The reference re-renders the whole ray K times; since density
is shared, the batched form marches ONCE and vmaps only the rgb heads —
same math (rgb = sum_k g_k rgb_k, scalar gated depth/opacity:
block_rendering.py:54-56), K-fold less marching/compositing.

moe_render (zoo of complete NGPs): independent fields -> vmap the full
per-model render like ml_render, composing with a Ray_Gate/position gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.block import BlockNGPConfig, block_density
from ..models.mlp import apply_mlp
from ..ops.sh import sh_encode_dir
from .render import RenderConfig, render_test, render_train


def _gated_forward_fn(params, state, cfg: BlockNGPConfig, gating_code,
                      dense_S=None):
    """Field closure evaluating all K rgb heads and gating them per sample.

    gating_code: (N_rays, K) caller-supplied spatial assignment. On the
    dense layout samples arrive ray-major so the gate broadcasts by
    repetition (dense_S); on the flat layout the renderer passes each
    sample's `ray_id` and the gate is gathered per sample."""

    def fwd(x, d, ray_id=None):
        sigmas, h = block_density(params, state, cfg, x, return_feat=True)
        d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
        rgb_in = jnp.concatenate([d_enc, h], axis=-1)
        rgbs_k = jax.vmap(
            lambda p: apply_mlp(
                p, rgb_in, out_act=cfg.rgb_act.lower(),
                compute_dtype=cfg.cdtype,
            )
        )(params["rgb"])  # (K, N, 3)
        if ray_id is not None:
            gate_per_sample = jnp.take(gating_code, ray_id, axis=0)
        else:
            gate_per_sample = jnp.repeat(
                gating_code[:, None, :], dense_S, axis=1
            ).reshape(x.shape[0], -1)
        rgb = jnp.einsum(
            "nk,knc->nc", gate_per_sample, rgbs_k.astype(jnp.float32)
        )
        return sigmas, rgb

    return fwd


def block_render_train(
    params: dict,
    state: dict,
    cfg: BlockNGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gating_code: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
) -> dict:
    """Training render with external gating (block_rendering.py:12-63).

    Equivalent to the reference's K independent renders composed by
    gating_code: with shared density, w_k == w for all k, so
    sum_k g_k (sum_s w_s rgb_{k,s}) == sum_s w_s (sum_k g_k rgb_{k,s}).
    """
    out = render_train(
        None, state, cfg, rays_o, rays_d, key, rcfg,
        forward_fn=_gated_forward_fn(
            params, state, cfg, gating_code, dense_S=rcfg.samples_per_ray
        ),
    )
    # reference composes opacity/depth with the gate too; with a normalized
    # gate (rows summing to 1) they are unchanged, otherwise scale:
    gsum = gating_code.sum(axis=1)
    out["depth"] = out["depth"] * gsum
    out["opacity"] = out["opacity"] * gsum
    out["gating_code"] = gating_code
    return out


def block_render_test(
    params: dict,
    state: dict,
    cfg: BlockNGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gating_code: jnp.ndarray,
    rcfg: RenderConfig,
) -> dict:
    out = render_test(
        None, state, cfg, rays_o, rays_d, rcfg,
        forward_fn=_gated_forward_fn(
            params, state, cfg, gating_code, dense_S=rcfg.test_block_samples
        ),
    )
    gsum = gating_code.sum(axis=1)
    out["depth"] = out["depth"] * gsum
    out["opacity"] = out["opacity"] * gsum
    out["gating_code"] = gating_code
    return out


mega_render_train = block_render_train
mega_render_test = block_render_test


# ---------------------------------------------------------------------------
# moe_render — the NGP_zoo path (rendering.py:49-110)
# ---------------------------------------------------------------------------

def moe_render_train(
    zoo_params: dict,
    zoo_state: dict,
    cfg,
    gate_params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
    gate_type: str = "ray",
) -> dict:
    """Zoo-of-complete-NGPs MoE render. zoo_params: NGP params stacked on a
    leading (K, ...) axis (including per-model hash tables); zoo_state: occ
    stacked (K, C, G, G, G). Gate on origins (`position`) or origin‖dir
    (`ray`) (rendering.py:69-72)."""
    from ..models.gates import apply_ray_gate
    from ..models.mngp import expert_forward_fn

    if gate_type == "position":
        gate_in = jnp.concatenate([rays_o, rays_o], axis=1)
    else:
        gate_in = jnp.concatenate([rays_o, rays_d], axis=1)
    gate, importance, _ = apply_ray_gate(gate_params, gate_in)
    K = gate.shape[1]
    keys = jax.random.split(key, K)

    def render_one(table_k, geo_k, rgb_k, occ_k, key_k):
        fwd = expert_forward_fn(table_k, geo_k, rgb_k, zoo_state, cfg)
        sub_state = {**zoo_state, "occ": occ_k}
        return render_train(
            None, sub_state, cfg, rays_o, rays_d, key_k, rcfg,
            forward_fn=fwd,
        )

    from ..models.mlp import slice_stacked
    from .ml_render import _stack_results

    # unrolled expert loop (the Pallas hash-grid backward can't be vmapped)
    res = _stack_results(
        [
            render_one(
                zoo_params["hash_table"][k],
                slice_stacked(zoo_params["geo"], k),
                slice_stacked(zoo_params["rgb"], k),
                zoo_state["occ"][k],
                keys[k],
            )
            for k in range(K)
        ]
    )
    return {
        "rgb": jnp.einsum("nk,knc->nc", gate, res["rgb"]),
        "depth": jnp.transpose(res["depth"]),  # (N, K) per-model columns
        "opacity": jnp.einsum("nk,kn->n", gate, res["opacity"]),
        "gating_code": gate,
        "gating_importance": importance,
        "ws": res["ws"],
        "deltas": res["deltas"],
        "ts": res["ts"],
        "valid": res["valid"],
        "rm_samples": jnp.sum(res["rm_samples"]),
        "total_samples": jnp.sum(res["total_samples"]),
    }
