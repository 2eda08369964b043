"""NGP_zoo — an ensemble of K *complete* independent NGPs.

TPU twin of `NGP_zoo` (reference: models/networks.py:1100-1163): unlike
MNGP, every member has its own hash table, geo/rgb heads and occupancy
grid. Structurally identical to the unshared-encoder MNGP, so the params/
state layout is reused; only the intent differs (used by the moe_render /
train.py zoo path)."""

from __future__ import annotations

from .mngp import (  # noqa: F401
    MNGPConfig,
    init_mngp,
    init_mngp_state,
    mngp_forward_expert,
    mngp_update_density_grids,
)


def NGPZooConfig(**kw):
    kw.setdefault("shared_encoder", False)
    return MNGPConfig(**kw)


init_ngp_zoo = init_mngp
init_ngp_zoo_state = init_mngp_state
zoo_forward_model = mngp_forward_expert
zoo_update_density_grids = mngp_update_density_grids
