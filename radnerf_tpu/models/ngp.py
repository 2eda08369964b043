"""The NGP field: multiresolution hash encoding + tiny MLPs + occupancy grid.

TPU twin of `NGP` (reference: models/networks.py:17-211). Trainable params
(hash table, geo/rgb MLPs) and non-trainable state (density grid, unpacked
occupancy, bbox) are separate pytrees; all methods are pure functions.

Occupancy-grid maintenance reproduces update_density_grid
(networks.py:171-201): every 16 steps, sample cells (all cells during
warmup, else G^3/4 uniform + G^3/4 occupied per cascade), query the field,
EMA-max with decay 0.95, and re-threshold with min(mean positive density,
0.01 * 1024 / sqrt(3)). The `.item()` host sync at networks.py:405 becomes a
traced scalar; cell RNG uses threaded PRNG keys.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashgrid import (
    HashGridConfig,
    encode_dispatch,
    init_hashgrid_table,
)
from ..ops.sh import sh_encode_dir
from ..ops.trunc_exp import trunc_exp
from .mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    """Static NGP field configuration (networks.py:17-89 constants)."""

    scale: float = 0.5
    rgb_act: str = "sigmoid"
    log2_T: int = 19              # --hash_table_size (opt.py:25)
    grid_size: int = 128
    n_levels: int = 16
    n_features: int = 2
    base_resolution: int = 16
    geo_hidden: int = 64
    geo_layers: int = 1           # hidden layers in geo_net (networks.py:66)
    geo_out: int = 16             # feature dims beyond sigma
    rgb_hidden: int = 64
    rgb_layers: int = 2           # hidden layers in rgb_net (networks.py:87)
    sh_degree: int = 4
    compute_dtype: str = "float32"
    hash_impl: str = "auto"   # xla | pallas | auto (pallas on TPU)

    @property
    def cascades(self) -> int:
        # networks.py:31: max(1 + ceil(log2(2*scale)), 1)
        return max(1 + int(math.ceil(math.log2(2 * self.scale))), 1)

    @property
    def hash(self) -> HashGridConfig:
        return HashGridConfig.for_scene_scale(
            self.scale,
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_table_size=self.log2_T,
            base_resolution=self.base_resolution,
        )

    @property
    def feat_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def rgb_in_dim(self) -> int:
        return self.sh_degree**2 + self.geo_out

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def init_ngp(key: jax.Array, cfg: NGPConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "hash_table": init_hashgrid_table(k1, cfg.hash),
        "geo": init_mlp(
            k2, cfg.feat_dim, cfg.geo_hidden, 1 + cfg.geo_out, cfg.geo_layers
        ),
        "rgb": init_mlp(
            k3, cfg.rgb_in_dim, cfg.rgb_hidden, 3, cfg.rgb_layers
        ),
    }


def init_ngp_state(cfg: NGPConfig, bbox: np.ndarray | None = None) -> dict:
    """Non-trainable state. `bbox` (2, 3) overrides the default
    [-scale, scale]^3 box (register_bbox, networks.py:203-211)."""
    C, G = cfg.cascades, cfg.grid_size
    if bbox is None:
        xyz_min = -np.ones(3, np.float32) * cfg.scale
        xyz_max = np.ones(3, np.float32) * cfg.scale
    else:
        xyz_min = np.asarray(bbox[0], np.float32)
        xyz_max = np.asarray(bbox[1], np.float32)
    return {
        "density_grid": jnp.zeros((C, G**3), jnp.float32),
        "occ": jnp.zeros((C, G, G, G), jnp.bool_),
        "xyz_min": jnp.asarray(xyz_min),
        "xyz_max": jnp.asarray(xyz_max),
    }


def scene_center_half(state: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    center = (state["xyz_min"] + state["xyz_max"]) * 0.5
    half = (state["xyz_max"] - state["xyz_min"]) * 0.5
    return center, half


def ngp_density(
    params: dict,
    state: dict,
    cfg: NGPConfig,
    x: jnp.ndarray,
    return_feat: bool = False,
    impl: str | None = None,
):
    """sigma(x) (networks.py:91-108). x: (N, 3) in world coords."""
    xn = (x - state["xyz_min"]) / (state["xyz_max"] - state["xyz_min"])
    xn = jnp.clip(xn, 0.0, 1.0)
    feat = encode_dispatch(
        params["hash_table"], xn, cfg.hash, cfg.cdtype,
        impl or cfg.hash_impl,
    )
    h = apply_mlp(params["geo"], feat, compute_dtype=cfg.cdtype)
    sigmas = trunc_exp(h[:, 0])
    if return_feat:
        return sigmas, h[:, 1:]
    return sigmas


def ngp_forward(
    params: dict, state: dict, cfg: NGPConfig, x: jnp.ndarray, d: jnp.ndarray
):
    """(sigma, rgb)(x, d) (networks.py:110-126)."""
    sigmas, h = ngp_density(params, state, cfg, x, return_feat=True)
    d_enc = sh_encode_dir(d, cfg.sh_degree).astype(cfg.cdtype)
    rgbs = apply_mlp(
        params["rgb"],
        jnp.concatenate([d_enc, h], axis=-1),
        out_act=cfg.rgb_act.lower(),
        compute_dtype=cfg.cdtype,
    )
    return sigmas, rgbs.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Occupancy grid maintenance
# ---------------------------------------------------------------------------

def all_cell_coords(cfg: NGPConfig) -> jnp.ndarray:
    """(G^3, 3) int32 cell coords in the grid's linear layout
    (flat index = (x*G + y)*G + z)."""
    G = cfg.grid_size
    r = np.arange(G, dtype=np.int32)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return jnp.asarray(
        np.stack([xx, yy, zz], -1).reshape(-1, 3)
    )


def coords_to_flat(coords: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    return (
        coords[..., 0] * grid_size + coords[..., 1]
    ) * grid_size + coords[..., 2]


def cell_world_positions(
    coords: jnp.ndarray, cascade: int, cfg: NGPConfig, key: jax.Array
) -> jnp.ndarray:
    """Jittered world position of cells in one cascade
    (networks.py:182-187): s = min(2^(c-1), scale), half-cell jitter."""
    G = cfg.grid_size
    s = min(2.0 ** (cascade - 1), cfg.scale)
    half = s / G
    xyz = (coords.astype(jnp.float32) / (G - 1) * 2.0 - 1.0) * (s - half)
    jitter = jax.random.uniform(key, xyz.shape, minval=-1.0, maxval=1.0)
    return xyz + jitter * half


def _sample_cells(
    key: jax.Array, density_grid_c: jnp.ndarray, M: int,
    density_threshold: float, grid_size: int,
) -> jnp.ndarray:
    """M uniform + M occupied cell flat indices for one cascade
    (networks.py:142-169). Occupied cells are drawn with replacement via
    inverse-CDF on the occupancy mask; if no cell is occupied the second
    half falls back to the uniform draw (the reference then returns only
    the uniform half — same effect, static shape)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_cells = density_grid_c.shape[0]
    idx_uniform = jax.random.randint(k1, (M,), 0, n_cells)
    mask = (density_grid_c > density_threshold).astype(jnp.int32)
    cdf = jnp.cumsum(mask)
    total = cdf[-1]
    u = jax.random.randint(k2, (M,), 0, jnp.maximum(total, 1))
    idx_occ = jnp.searchsorted(cdf, u, side="right")
    idx_occ = jnp.where(
        total > 0, idx_occ, jax.random.randint(k3, (M,), 0, n_cells)
    )
    return jnp.concatenate([idx_uniform, idx_occ])


def update_density_grid(
    params: dict,
    state: dict,
    cfg: NGPConfig,
    key: jax.Array,
    density_threshold: float,
    warmup: bool,
    decay: float = 0.95,
    density_fn=None,
) -> dict:
    """One occupancy-grid update (networks.py:171-201). Returns new state.

    `warmup` must be a static Python bool (the reference switches on
    global_step < 256 outside the jitted region too). `density_fn` lets
    ensemble models (MNGP) inject their per-expert density closure.
    """
    C, G = cfg.cascades, cfg.grid_size
    if density_fn is None:
        # grid cells are spatially incoherent draws -> windowed impl
        from ..ops.hashgrid import incoherent_impl

        density_fn = lambda x: ngp_density(
            params, state, cfg, x, impl=incoherent_impl(cfg.hash_impl)
        )

    grid = state["density_grid"]
    tmp = jnp.zeros_like(grid)
    keys = jax.random.split(key, 2 * C)
    if warmup:
        coords = all_cell_coords(cfg)
        flat = coords_to_flat(coords, G)
        for c in range(C):
            xyz = cell_world_positions(coords, c, cfg, keys[2 * c])
            tmp = tmp.at[c, flat].set(density_fn(xyz).astype(jnp.float32))
    else:
        M = G**3 // 4
        for c in range(C):
            flat = _sample_cells(
                keys[2 * c + 1], grid[c], M, density_threshold, G
            )
            coords = jnp.stack(
                [flat // (G * G), (flat // G) % G, flat % G], axis=-1
            )
            xyz = cell_world_positions(coords, c, cfg, keys[2 * c])
            tmp = tmp.at[c, flat].set(density_fn(xyz).astype(jnp.float32))

    new_grid = jnp.where(
        grid < 0, grid, jnp.maximum(grid * decay, tmp)
    )
    pos = new_grid > 0
    mean_density = jnp.sum(jnp.where(pos, new_grid, 0.0)) / jnp.maximum(
        jnp.sum(pos), 1
    )
    thresh = jnp.minimum(mean_density, density_threshold)
    occ = (new_grid > thresh).reshape(C, G, G, G)
    return {**state, "density_grid": new_grid, "occ": occ}
