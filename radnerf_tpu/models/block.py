"""Block-NeRF-style and Mega-NeRF-style baselines.

TPU twin of `block_NGP` / `mega_NGP` (reference: models/block_networks.py
:18-215, models/mega_networks.py — the two are byte-identical twins except
the class name; SURVEY.md §2.2). Architecture: shared hash encoder + shared
geo head + per-submodel rgb heads; ONE shared occupancy grid; the
per-submodel assignment (`gating_code`) is supplied externally by the
renderer/trainer (spatial for block/mega)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.hashgrid import encode_dispatch, init_hashgrid_table
from ..ops.sh import sh_encode_dir
from ..ops.trunc_exp import trunc_exp
from .mlp import apply_mlp, init_mlp, init_stacked_mlp, slice_stacked
from .ngp import NGPConfig, init_ngp_state


@dataclasses.dataclass(frozen=True)
class BlockNGPConfig(NGPConfig):
    n_experts: int = 2


def init_block_ngp(key: jax.Array, cfg: BlockNGPConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "hash_table": init_hashgrid_table(k1, cfg.hash),
        "geo": init_mlp(
            k2, cfg.feat_dim, cfg.geo_hidden, 1 + cfg.geo_out,
            cfg.geo_layers,
        ),
        "rgb": init_stacked_mlp(
            k3, cfg.n_experts, cfg.rgb_in_dim, cfg.rgb_hidden, 3,
            cfg.rgb_layers,
        ),
    }


init_block_ngp_state = init_ngp_state  # single shared grid


def block_density(
    params: dict, state: dict, cfg: BlockNGPConfig, x: jnp.ndarray,
    return_feat: bool = False,
):
    """Shared density (block_networks.py:132-148)."""
    xn = (x - state["xyz_min"]) / (state["xyz_max"] - state["xyz_min"])
    xn = jnp.clip(xn, 0.0, 1.0)
    feat = encode_dispatch(
        params["hash_table"], xn, cfg.hash, cfg.cdtype, cfg.hash_impl
    )
    h = apply_mlp(params["geo"], feat, compute_dtype=cfg.cdtype)
    sigmas = trunc_exp(h[:, 0])
    if return_feat:
        return sigmas, h[:, 1:]
    return sigmas


def block_forward(
    params: dict, state: dict, cfg: BlockNGPConfig, x: jnp.ndarray,
    d: jnp.ndarray, ind,
):
    """(sigma, rgb) with submodel `ind`'s rgb head
    (block_networks.py:113-130). `ind` may be traced."""
    sigmas, h = block_density(params, state, cfg, x, return_feat=True)
    d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
    rgbs = apply_mlp(
        slice_stacked(params["rgb"], ind),
        jnp.concatenate([d_enc, h], axis=-1),
        out_act=cfg.rgb_act.lower(),
        compute_dtype=cfg.cdtype,
    )
    return sigmas, rgbs.astype(jnp.float32)


# mega_NGP is the same architecture (mega_networks.py is a byte-identical
# twin of block_networks.py modulo the class name)
MegaNGPConfig = BlockNGPConfig
init_mega_ngp = init_block_ngp
init_mega_ngp_state = init_block_ngp_state
mega_density = block_density
mega_forward = block_forward
