"""Multiresolution hash-grid encoding (Instant-NGP).

TPU twin of tinycudann's Grid/Hash encoding, the xyz encoder of every field
in the reference (models/networks.py:42-55: L=16 levels, F=2 features,
T=2^log2_T entries, N_min=16, per-level scale b, linear interpolation).

Semantics follow tcnn / the Instant-NGP paper (arXiv:2201.05989):
  scale_l  = N_min * b**l - 1
  res_l    = ceil(scale_l) + 1
  pos      = x * scale_l + 0.5          (x in [0,1]^3)
  corner   = floor(pos) + {0,1}^3, trilinear weights from frac(pos)
  index    = x + y*res + z*res^2                 if res^3 <= T   (dense)
           = (x*1 ^ y*2654435761 ^ z*805459861)  otherwise       (hashed)
  index  %= T  (T is a power of two -> bitwise and)
  out      = concat over levels of interpolated F-vectors  -> (N, L*F)

Forward = one big gather over the stacked (L, T, F) table; backward (the
training bottleneck) = XLA scatter-add via autodiff of the gather. A Pallas
kernel (ops/hashgrid_pallas.py) accelerates the hot path; this file is the
semantic reference implementation and the fallback.

Tables are stored as a single (L, T, F) array: uniform shapes keep the
gather/scatter XLA-friendly; dense low-resolution levels simply use a prefix
of their T rows, matching tcnn's dense addressing exactly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

# Spatial hash primes (Instant-NGP paper, table 1; tcnn fast_hash).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static configuration of the hash-grid encoder.

    Defaults mirror the reference field (networks.py:38-40):
    L=16, F=2, log2_T=19, N_min=16, b=exp(ln(2048*scale/16)/15).
    """

    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.3819128800   # b for scene scale=1 (opt.py:23)
    interpolation: str = "linear"

    @staticmethod
    def for_scene_scale(
        scale: float,
        n_levels: int = 16,
        n_features: int = 2,
        log2_table_size: int = 19,
        base_resolution: int = 16,
        max_resolution_mult: float = 2048.0,
    ) -> "HashGridConfig":
        """b chosen so the finest level reaches 2048*scale (networks.py:39)."""
        b = math.exp(
            math.log(max_resolution_mult * scale / base_resolution)
            / (n_levels - 1)
        )
        return HashGridConfig(
            n_levels=n_levels,
            n_features=n_features,
            log2_table_size=log2_table_size,
            base_resolution=base_resolution,
            per_level_scale=b,
        )

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_scales(self) -> np.ndarray:
        l = np.arange(self.n_levels)
        return (
            self.base_resolution * self.per_level_scale**l - 1.0
        ).astype(np.float32)

    def level_resolutions(self) -> np.ndarray:
        return (np.ceil(self.level_scales()) + 1).astype(np.int64)

    def level_is_dense(self) -> np.ndarray:
        res = self.level_resolutions()
        return (res**3) <= self.table_size


def init_hashgrid_table(
    key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32
) -> jnp.ndarray:
    """tcnn's default init: uniform in [-1e-4, 1e-4]."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


# The 8 cube-corner offsets, shaped for broadcasting: (8, 3).
_CORNERS = np.array(
    [[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
    dtype=np.int32,
)


def hashgrid_indices(
    x: jnp.ndarray, cfg: HashGridConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute gather indices and trilinear weights for all levels.

    Args:
        x: (N, 3) positions in [0, 1]^3.
    Returns:
        idx: (L, N, 8) int32 per-level table rows.
        w:   (L, N, 8) float32 trilinear weights.
    """
    scales = jnp.asarray(cfg.level_scales())  # (L,)
    res = jnp.asarray(cfg.level_resolutions().astype(np.int32))
    dense = jnp.asarray(cfg.level_is_dense())
    tmask = jnp.uint32(cfg.table_size - 1)

    pos = x[None, :, :] * scales[:, None, None] + 0.5  # (L, N, 3)
    pos_i = jnp.floor(pos)
    frac = (pos - pos_i).astype(jnp.float32)
    pos_i = pos_i.astype(jnp.int32)

    corner = pos_i[:, :, None, :] + _CORNERS[None, None, :, :]  # (L,N,8,3)
    cu = corner.astype(jnp.uint32)

    r = res[:, None, None].astype(jnp.uint32)
    idx_dense = cu[..., 0] + r * (cu[..., 1] + r * cu[..., 2])
    idx_hash = (
        cu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ cu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ cu[..., 2] * jnp.uint32(_PRIMES[2])
    )
    idx = jnp.where(dense[:, None, None], idx_dense, idx_hash) & tmask

    # Trilinear weights: prod_d (corner_d ? frac_d : 1 - frac_d).
    csel = _CORNERS[None, None, :, :].astype(jnp.float32)  # (1,1,8,3)
    w = jnp.prod(
        csel * frac[:, :, None, :] + (1.0 - csel) * (1.0 - frac[:, :, None, :]),
        axis=-1,
    )
    return idx.astype(jnp.int32), w


def hashgrid_indices_cm(
    x: jnp.ndarray, cfg: HashGridConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Corner-major gather indices and weights: (L, 8, N).

    TPU layout note: the point-major (L, N, 8) layout of
    :func:`hashgrid_indices` puts the 8-corner axis on the vector lanes,
    which the TPU tiled layout pads 16x (T(8,128) tiles, 8 of 128 lanes
    used) — every downstream array then carries 16-64x memory waste (the
    round-1 batch-8192 HBM OOM). Corner-major keeps N on the lanes:
    every intermediate is full-width.
    """
    N = x.shape[0]
    scales = jnp.asarray(cfg.level_scales())            # (L,)
    res = jnp.asarray(cfg.level_resolutions().astype(np.int32))
    dense = jnp.asarray(cfg.level_is_dense())
    tmask = jnp.uint32(cfg.table_size - 1)
    bits = jnp.asarray(_CORNERS.T)                      # (3, 8)

    xt = jnp.transpose(x)                               # (3, N)
    pos = xt[None, :, :] * scales[:, None, None] + 0.5  # (L, 3, N)
    pos_i = jnp.floor(pos)
    frac = (pos - pos_i).astype(jnp.float32)
    pos_i = pos_i.astype(jnp.int32)

    # per-axis corner coords (L, 8, N)
    cu = [
        (pos_i[:, d, None, :] + bits[d][None, :, None]).astype(jnp.uint32)
        for d in range(3)
    ]
    r = res[:, None, None].astype(jnp.uint32)
    idx_dense = cu[0] + r * (cu[1] + r * cu[2])
    idx_hash = (
        cu[0] * jnp.uint32(_PRIMES[0])
        ^ cu[1] * jnp.uint32(_PRIMES[1])
        ^ cu[2] * jnp.uint32(_PRIMES[2])
    )
    idx = jnp.where(dense[:, None, None], idx_dense, idx_hash) & tmask

    w = jnp.ones((cfg.n_levels, 8, N), jnp.float32)
    for d in range(3):
        b = bits[d][None, :, None].astype(jnp.float32)
        f = frac[:, d, None, :]
        w = w * (b * f + (1.0 - b) * (1.0 - f))
    return idx.astype(jnp.int32), w


def _flat_level_idx(idx: jnp.ndarray, T: int) -> jnp.ndarray:
    """(L, 8, N) per-level rows -> (L*8*N,) rows into the stacked table."""
    L = idx.shape[0]
    return (
        jnp.arange(L, dtype=jnp.int32)[:, None, None] * T + idx
    ).reshape(-1)


def _cm_out(o0: jnp.ndarray, o1: jnp.ndarray) -> jnp.ndarray:
    """(L, N) per-feature sums -> (N, L*F) level-major tcnn layout."""
    L, N = o0.shape
    return (
        jnp.stack([o0, o1], axis=1)      # (L, 2, N), full-width
        .transpose(2, 0, 1)
        .reshape(N, L * 2)
    )


def hashgrid_encode(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Encode positions through the multiresolution hash grid.

    Differentiable reference path: two full-width per-feature gathers (the
    autodiff backward is a scatter-add). Corner-major internals — no
    narrow (…, 2) or (…, 8) arrays are materialized.

    Args:
        table: (L, T, F) feature table.
        x: (N, 3) positions in [0, 1]^3 (caller clips; reference
           networks.py:100-101 normalizes by bbox then clips).
    Returns:
        (N, L*F) features, level-major (matching tcnn's output layout).
    """
    L, T, F = table.shape
    assert F == 2
    N = x.shape[0]
    idx, w = hashgrid_indices_cm(x, cfg)           # (L, 8, N)
    flat = _flat_level_idx(idx, T)
    t0 = table[..., 0].reshape(-1).astype(compute_dtype)
    t1 = table[..., 1].reshape(-1).astype(compute_dtype)
    f0 = jnp.take(t0, flat).reshape(L, 8, N)
    f1 = jnp.take(t1, flat).reshape(L, 8, N)
    wc = w.astype(compute_dtype)
    return _cm_out(jnp.sum(wc * f0, axis=1), jnp.sum(wc * f1, axis=1))


def hashgrid_encode_packed(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """bf16 encode via ONE u32 gather per (level, point, corner).

    Both bf16 features of a row are packed into one uint32 (tcnn packs
    fp16x2 the same way for its vectorized loads), halving the gather
    issue count and avoiding narrow-row gathers entirely. NOT
    differentiable (integer ops) — used as the forward of the custom-VJP
    encodes; output matches hashgrid_encode(..., bfloat16) bit-exactly.
    """
    L, T, F = table.shape
    assert F == 2
    N = x.shape[0]
    idx, w = hashgrid_indices_cm(x, cfg)
    packed = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16), jnp.uint32
    )  # (L, T): low 16 bits = feature 0
    g = jnp.take(packed.reshape(-1), _flat_level_idx(idx, T))
    f0 = jax.lax.bitcast_convert_type(
        (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).reshape(L, 8, N)
    f1 = jax.lax.bitcast_convert_type(
        (g >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    ).reshape(L, 8, N)
    wc = w.astype(jnp.bfloat16)
    return _cm_out(jnp.sum(wc * f0, axis=1), jnp.sum(wc * f1, axis=1))


def resolve_impl(impl: str) -> str:
    """'auto' -> the measured-fastest backend for ray-ordered samples."""
    if impl != "auto":
        return impl
    import jax

    # TPU backends register as 'tpu' or (via the axon relay) 'axon'.
    # 'brick3' = cube-brick table layout: ONE row gather per (level,
    # point), row-run dedup forward, fused Pallas extract + one-hot-MXU
    # windowed backward — measured fastest (bench.py 47.9k vs the round-4
    # xy-brick's 18.7k rays/s at the honest adaptive bucket) and AHEAD of
    # brick on the full-scale hard-scene curve at matched steps
    # (docs/CONVERGENCE.md round-5 row; docs/curves/hard_brick3_*).
    return "brick3" if jax.default_backend() != "cpu" else "xla"


def hash_family(impl: str) -> str:
    """Table-layout/spatial-hash family of an encode impl.

    'slab' addresses the table with the z-scrambled additive slab hash
    (ops/hashgrid_slab.py); every other impl uses the tcnn-style
    xor-multiply hash. Tables trained under one family decode as garbage
    under the other, so checkpoints record the resolved family
    (trainer.save_checkpoint) and loads reconcile against it."""
    r = resolve_impl(impl)
    if r in ("slab", "slab_plain"):
        return "slab"
    if r == "brick":
        return "brick"
    if r in ("brick3", "brick3_plain"):
        return "brick3"
    return "tcnn"


def incoherent_impl(impl: str) -> str:
    """Best impl for spatially-INCOHERENT point sets (density-grid updates
    sample random cells, networks.py:142-169): the run-length dedup would
    always overflow to its fallback and waste its per-level sorts, so route
    to the plain-forward variant of the same table layout."""
    r = resolve_impl(impl)
    return {
        "dedup": "window",
        "slab": "slab_plain",
        "brick3": "brick3_plain",
    }.get(r, r)


def encode_dispatch(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.float32,
    impl: str = "auto",
) -> jnp.ndarray:
    """Pick the encode implementation by backward strategy:
      'xla'    — autodiff scatter-add (serializes on TPU; fine on CPU)
      'pallas' — round-1 serial row-RMW Pallas kernel (~33M upd/s)
      'sort'   — lax.sort + sorted-hint scatter (pure XLA, ~80M upd/s)
      'window' — lax.sort + windowed dense Pallas accumulation
      'dedup'  — ray-coherent run-length dedup fw/bw on top of 'window'
                 (exploits sample adjacency along rays)
      'slab'   — slab table layout: one (2,2)-slice gather per 4 corners
                 + x-pair windowed backward (fastest; DIFFERENT hash than
                 tcnn — see ops/hashgrid_slab.py; bf16 compute only,
                 falls back to 'dedup' for other dtypes)
      'auto'   — 'dedup' on TPU, 'xla' elsewhere.
    Measured comparison: examples/bench_scatter.py."""
    if impl == "auto":
        impl = resolve_impl(impl)
    if impl in ("brick3", "brick3_plain"):
        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            from .hashgrid_brick3 import hashgrid_encode_brick3

            return hashgrid_encode_brick3(
                table, x, cfg, compute_dtype,
                fw_mode="plain" if impl == "brick3_plain" else "runs",
            )
        impl = "dedup"
    if impl == "brick":
        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            from .hashgrid_brick import hashgrid_encode_brick

            return hashgrid_encode_brick(table, x, cfg, compute_dtype)
        impl = "dedup"
    if impl in ("slab", "slab_plain"):
        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            from .hashgrid_slab import hashgrid_encode_slab

            return hashgrid_encode_slab(
                table, x, cfg, compute_dtype,
                fw_mode="plain" if impl == "slab_plain" else "dedup",
            )
        impl = "dedup"
    if impl == "dedup":
        from .hashgrid_dedup import hashgrid_encode_dedup

        return hashgrid_encode_dedup(table, x, cfg, compute_dtype)
    if impl == "window":
        from .hashgrid_window import hashgrid_encode_window

        return hashgrid_encode_window(table, x, cfg, compute_dtype)
    if impl == "sort":
        from .hashgrid_sort import hashgrid_encode_sort

        return hashgrid_encode_sort(table, x, cfg, compute_dtype)
    if impl == "pallas":
        from .hashgrid_pallas import hashgrid_encode_fused

        return hashgrid_encode_fused(table, x, cfg, compute_dtype)
    return hashgrid_encode(table, x, cfg, compute_dtype)
