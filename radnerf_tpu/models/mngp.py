"""MNGP — the Rad-NeRF sub-NeRF ensemble as a *batched gated mixture*.

TPU twin of `MNGP` (reference: models/networks.py:214-421): K sub-NeRFs
sharing ONE hash encoder and ONE SH direction encoder, with per-sub-NeRF
geo/rgb MLPs and per-sub-NeRF occupancy grids.

Instead of the reference's Python loop over `geo_net_{i}` attributes, expert
weights live on a leading (K, ...) axis; `mngp_forward_expert` picks one
expert with a (traced) index, and `mngp_forward_all` evaluates every expert
on the same points with vmap over the weight axis (used by renderers that
share one sample set across experts). `unshared_MNGP` (networks.py:424-628,
per-expert hash tables) is the `shared_encoder=False` variant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashgrid import encode_dispatch, init_hashgrid_table
from ..ops.sh import sh_encode_dir
from ..ops.trunc_exp import trunc_exp
from .mlp import apply_mlp, init_stacked_mlp, slice_stacked
from .ngp import NGPConfig, update_density_grid


@dataclasses.dataclass(frozen=True)
class MNGPConfig(NGPConfig):
    """NGPConfig + ensemble size (reference `size`, --model_zoo_size)."""

    n_experts: int = 2
    shared_encoder: bool = True   # False = unshared_MNGP


def init_mngp(key: jax.Array, cfg: MNGPConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.shared_encoder:
        table = init_hashgrid_table(k1, cfg.hash)
    else:
        table = jax.vmap(
            lambda k: init_hashgrid_table(k, cfg.hash)
        )(jax.random.split(k1, cfg.n_experts))
    return {
        "hash_table": table,
        "geo": init_stacked_mlp(
            k2, cfg.n_experts, cfg.feat_dim, cfg.geo_hidden,
            1 + cfg.geo_out, cfg.geo_layers,
        ),
        "rgb": init_stacked_mlp(
            k3, cfg.n_experts, cfg.rgb_in_dim, cfg.rgb_hidden, 3,
            cfg.rgb_layers,
        ),
    }


def init_mngp_state(cfg: MNGPConfig, bbox: np.ndarray | None = None) -> dict:
    """Per-expert density grids/occupancy (networks.py:263-268) + bbox."""
    C, G, K = cfg.cascades, cfg.grid_size, cfg.n_experts
    if bbox is None:
        xyz_min = -np.ones(3, np.float32) * cfg.scale
        xyz_max = np.ones(3, np.float32) * cfg.scale
    else:
        xyz_min = np.asarray(bbox[0], np.float32)
        xyz_max = np.asarray(bbox[1], np.float32)
    return {
        "density_grid": jnp.zeros((K, C, G**3), jnp.float32),
        "occ": jnp.zeros((K, C, G, G, G), jnp.bool_),
        "xyz_min": jnp.asarray(xyz_min),
        "xyz_max": jnp.asarray(xyz_max),
    }


def _encode(params, state, cfg: MNGPConfig, x: jnp.ndarray, ind=None,
            impl: str | None = None):
    xn = (x - state["xyz_min"]) / (state["xyz_max"] - state["xyz_min"])
    xn = jnp.clip(xn, 0.0, 1.0)
    table = params["hash_table"]
    if not cfg.shared_encoder:
        table = table[ind]
    return encode_dispatch(
        table, xn, cfg.hash, cfg.cdtype, impl or cfg.hash_impl
    )


def mngp_density_expert(
    params: dict, state: dict, cfg: MNGPConfig, x: jnp.ndarray, ind,
    return_feat: bool = False, impl: str | None = None,
):
    """sigma(x) of one expert (networks.py:291-309). `ind` may be traced."""
    feat = _encode(params, state, cfg, x, ind, impl=impl)
    h = apply_mlp(
        slice_stacked(params["geo"], ind), feat, compute_dtype=cfg.cdtype
    )
    sigmas = trunc_exp(h[:, 0])
    if return_feat:
        return sigmas, h[:, 1:]
    return sigmas


def mngp_forward_expert(
    params: dict, state: dict, cfg: MNGPConfig, x: jnp.ndarray,
    d: jnp.ndarray, ind,
):
    """(sigma, rgb) of one expert (networks.py:311-328)."""
    sigmas, h = mngp_density_expert(params, state, cfg, x, ind, True)
    d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
    rgbs = apply_mlp(
        slice_stacked(params["rgb"], ind),
        jnp.concatenate([d_enc, h], axis=-1),
        out_act=cfg.rgb_act.lower(),
        compute_dtype=cfg.cdtype,
    )
    return sigmas, rgbs.astype(jnp.float32)


def mngp_forward_all(
    params: dict, state: dict, cfg: MNGPConfig, x: jnp.ndarray, d: jnp.ndarray
):
    """All experts on the same points: sigmas (K, N), rgbs (K, N, 3).

    The shared hash encoding is computed ONCE and broadcast over experts —
    the batched-mixture optimization the reference's per-expert loop cannot
    express (SURVEY.md §2.8 EP row)."""
    if cfg.shared_encoder:
        feat = _encode(params, state, cfg, x)
        h = jax.vmap(
            lambda p: apply_mlp(p, feat, compute_dtype=cfg.cdtype)
        )(params["geo"])  # (K, N, 17)
    else:
        h = jax.vmap(
            lambda t, p: apply_mlp(
                p,
                encode_dispatch(
                    t,
                    jnp.clip(
                        (x - state["xyz_min"])
                        / (state["xyz_max"] - state["xyz_min"]),
                        0.0,
                        1.0,
                    ),
                    cfg.hash,
                    cfg.cdtype,
                    cfg.hash_impl,
                ),
                compute_dtype=cfg.cdtype,
            )
        )(params["hash_table"], params["geo"])
    sigmas = trunc_exp(h[..., 0])
    d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
    rgb_in = jax.vmap(
        lambda hk: jnp.concatenate([d_enc, hk], axis=-1)
    )(h[..., 1:])
    rgbs = jax.vmap(
        lambda p, xin: apply_mlp(
            p, xin, out_act=cfg.rgb_act.lower(), compute_dtype=cfg.cdtype
        )
    )(params["rgb"], rgb_in)
    return sigmas, rgbs.astype(jnp.float32)


def expert_forward_fn(table, geo_p, rgb_p, state, cfg: MNGPConfig):
    """Build a `(x, d) -> (sigma, rgb)` closure from one expert's
    already-sliced weights (used under vmap by the MoE renderers)."""

    def fwd(x, d):
        xn = (x - state["xyz_min"]) / (state["xyz_max"] - state["xyz_min"])
        xn = jnp.clip(xn, 0.0, 1.0)
        feat = encode_dispatch(table, xn, cfg.hash, cfg.cdtype, cfg.hash_impl)
        h = apply_mlp(geo_p, feat, compute_dtype=cfg.cdtype)
        sigmas = trunc_exp(h[:, 0])
        d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
        rgbs = apply_mlp(
            rgb_p,
            jnp.concatenate([d_enc, h[:, 1:]], axis=-1),
            out_act=cfg.rgb_act.lower(),
            compute_dtype=cfg.cdtype,
        )
        return sigmas, rgbs.astype(jnp.float32)

    return fwd


def mngp_update_density_grids(
    params: dict,
    state: dict,
    cfg: MNGPConfig,
    key: jax.Array,
    density_threshold: float,
    warmup: bool,
    decay: float = 0.95,
) -> dict:
    """Update all K per-expert grids (networks.py:374-409) via vmap."""
    from ..ops.hashgrid import incoherent_impl

    keys = jax.random.split(key, cfg.n_experts)
    impl = incoherent_impl(cfg.hash_impl)

    def one(k, grid_k, occ_k, ind):
        sub_state = {**state, "density_grid": grid_k, "occ": occ_k}
        new = update_density_grid(
            params, sub_state, cfg, k, density_threshold, warmup, decay,
            density_fn=lambda x: mngp_density_expert(
                params, state, cfg, x, ind, impl=impl
            ),
        )
        return new["density_grid"], new["occ"]

    grids, occs = jax.vmap(one)(
        keys, state["density_grid"], state["occ"],
        jnp.arange(cfg.n_experts),
    )
    return {**state, "density_grid": grids, "occ": occs}
