"""Switch-NeRF-style baseline — shared field with a noisy top-1 *point* gate
mixing per-expert feature transforms.

TPU twin of `switch_NGP` (reference: models/switch_networks.py:18-245):
shared hash encoder -> Point_Gate over the encoded features -> K
`inter_net_i` 32->32 feature MLPs mixed by the (sparse) gate -> single
shared geo/rgb head; one shared occupancy grid. The K-loop over inter nets
becomes one stacked vmap + gate einsum. The reference's training entry
(train_other.py) was never shipped (SURVEY.md §8 quirk 6); ours is
train_other.py at the repo root.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashgrid import encode_dispatch, init_hashgrid_table
from ..ops.sh import sh_encode_dir
from ..ops.trunc_exp import trunc_exp
from .gates import apply_point_gate, init_point_gate
from .mlp import apply_mlp, init_mlp, init_stacked_mlp
from .ngp import NGPConfig, init_ngp_state


@dataclasses.dataclass(frozen=True)
class SwitchNGPConfig(NGPConfig):
    n_experts: int = 2
    num_topk: int = 1
    inter_layers: int = 2   # switch_networks.py:66


def init_switch_ngp(key: jax.Array, cfg: SwitchNGPConfig) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "hash_table": init_hashgrid_table(k1, cfg.hash),
        "inter": init_stacked_mlp(
            k2, cfg.n_experts, cfg.feat_dim, 64, cfg.feat_dim,
            cfg.inter_layers,
        ),
        "gate": init_point_gate(k3, cfg.feat_dim, cfg.n_experts),
        "geo": init_mlp(
            k4, cfg.feat_dim, cfg.geo_hidden, 1 + cfg.geo_out,
            cfg.geo_layers,
        ),
        "rgb": init_mlp(k5, cfg.rgb_in_dim, cfg.rgb_hidden, 3,
                        cfg.rgb_layers),
    }


init_switch_ngp_state = init_ngp_state  # single shared grid, like NGP


def switch_density(
    params: dict,
    state: dict,
    cfg: SwitchNGPConfig,
    x: jnp.ndarray,
    key: jax.Array | None = None,
    train: bool = False,
    return_feat: bool = False,
):
    """sigma(x) through the gated feature mixture
    (switch_networks.py:118-142)."""
    xn = (x - state["xyz_min"]) / (state["xyz_max"] - state["xyz_min"])
    xn = jnp.clip(xn, 0.0, 1.0)
    feat = encode_dispatch(
        params["hash_table"], xn, cfg.hash, cfg.cdtype, cfg.hash_impl
    )
    gate, load, top_idx = apply_point_gate(
        params["gate"], feat, key, k=cfg.num_topk, train=train,
        compute_dtype=cfg.cdtype,
    )
    # mix per-expert feature transforms by the (sparse) gate
    inter = jax.vmap(
        lambda p: apply_mlp(p, feat, compute_dtype=cfg.cdtype)
    )(params["inter"])  # (K, N, F)
    post = jnp.einsum("nk,knf->nf", gate.astype(cfg.cdtype), inter)
    h = apply_mlp(params["geo"], post, compute_dtype=cfg.cdtype)
    sigmas = trunc_exp(h[:, 0])
    gate_results = {"code": gate, "importance": load, "indice": top_idx}
    if return_feat:
        return sigmas, h[:, 1:], gate_results
    return sigmas


def switch_forward(
    params: dict,
    state: dict,
    cfg: SwitchNGPConfig,
    x: jnp.ndarray,
    d: jnp.ndarray,
    key: jax.Array | None = None,
    train: bool = False,
):
    """(sigma, rgb, gate_results) (switch_networks.py:144-160)."""
    sigmas, h, gate_results = switch_density(
        params, state, cfg, x, key, train, return_feat=True
    )
    d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
    rgbs = apply_mlp(
        params["rgb"],
        jnp.concatenate([d_enc, h], axis=-1),
        out_act=cfg.rgb_act.lower(),
        compute_dtype=cfg.cdtype,
    )
    return sigmas, rgbs.astype(jnp.float32), gate_results
