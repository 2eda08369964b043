"""Occupancy-grid ray marching on a closed-form sample lattice.

TPU twin of `vren.raymarching_train` / `vren.raymarching_test`
(reference: models/csrc/raymarching.cu:166-454).

Key insight that makes this XLA-friendly: the CUDA marcher's step schedule
    t_{k+1} = t_k + clamp(t_k * f, dt_min, dt_max)
defines a *deterministic lattice* that depends only on the start t — the DDA
"empty-space skip" (raymarching.cu:224-233) merely fast-forwards along the
same lattice without consuming the sample budget. So instead of a sequential
per-ray loop with atomic compaction, we:

  1. evaluate the lattice t_k for k = 0..K-1 in closed form (the recurrence
     is piecewise linear -> geometric -> linear, so t_k is a direct formula
     of k — no scan),
  2. occupancy-test all K candidates in parallel (bitfield gather),
  3. compact the first S occupied candidates per ray into dense (N, S)
     buffers with a cumsum + scatter.

Sample positions are bit-for-bit on the same lattice as the CUDA kernel
(up to fp32 closed-form vs sequential-accumulation rounding); the ragged CSR
output (`rays_a`) becomes a dense (N, S) block + per-ray sample count, which
is what the masked compositor consumes.

dt_min = sqrt(3)/max_samples and dt_max = sqrt(3)*2*scale/grid_size match
calc_dt (raymarching.cu:11-13); mip selection matches mip_from_pos /
mip_from_dt (raymarching.cu:19-32).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Static marching parameters (shapes and schedule constants)."""

    scale: float = 0.5
    cascades: int = 1
    grid_size: int = 128
    exp_step_factor: float = 0.0
    max_samples: int = 1024          # reference MAX_SAMPLES (rendering.py:8)
    samples_per_ray: int = 128       # S: occupied samples retained per ray
    n_candidates: int = 0            # K: lattice points examined; 0 = auto

    @property
    def dt_min(self) -> float:
        return SQRT3 / self.max_samples

    @property
    def dt_max(self) -> float:
        return SQRT3 * 2.0 * self.scale / self.grid_size

    @property
    def k_candidates(self) -> int:
        if self.n_candidates > 0:
            return self.n_candidates
        if self.exp_step_factor == 0.0:
            # Linear lattice: crossing the [-scale, scale]^3 box diagonal
            # takes at most 2*scale*sqrt(3)/dt_min = 2*scale*max_samples
            # steps; the reference's own budget is max_samples occupied.
            return min(
                self.max_samples,
                int(math.ceil(2.0 * self.scale * self.max_samples)) + 1,
            )
        # Exponential lattice: count worst-case steps to cross the box.
        f = self.exp_step_factor
        t_a, t_b = self.dt_min / f, self.dt_max / f
        t_end = 2.0 * self.scale * SQRT3
        k = t_a / self.dt_min  # linear phase from t=0
        if t_end > t_a:
            k += math.log(min(t_end, t_b) / t_a) / math.log1p(f)
        if t_end > t_b:
            k += (t_end - t_b) / self.dt_max
        return int(math.ceil(k)) + 8


def sample_lattice(
    t_start: jnp.ndarray, k: jnp.ndarray, cfg: MarchConfig
) -> jnp.ndarray:
    """Closed-form lattice position t_k for start value t_start.

    Reproduces k applications of t <- t + clamp(t*f, dt_min, dt_max).
    t_start: (...,); k: broadcastable int array. Returns t of broadcast shape.
    """
    f = cfg.exp_step_factor
    dt_min, dt_max = cfg.dt_min, cfg.dt_max
    kf = k.astype(jnp.float32)
    if f == 0.0:
        return t_start + kf * dt_min
    t_a, t_b = dt_min / f, dt_max / f
    log1pf = math.log1p(f)
    # Phase A: linear steps of dt_min while t < t_a.
    kA = jnp.maximum(jnp.ceil((t_a - t_start) / dt_min), 0.0)
    tA = t_start + kA * dt_min
    # Phase B: geometric growth by (1+f) while t < t_b.
    kB = jnp.maximum(
        jnp.ceil(jnp.log(jnp.maximum(t_b / tA, 1e-12)) / log1pf), 0.0
    )
    tB = tA * jnp.exp(kB * log1pf)
    # Phase C: linear steps of dt_max.
    t_lin = t_start + kf * dt_min
    t_geo = tA * jnp.exp((kf - kA) * log1pf)
    t_far = tB + (kf - kA - kB) * dt_max
    return jnp.where(kf <= kA, t_lin, jnp.where(kf <= kA + kB, t_geo, t_far))


def calc_dt(t: jnp.ndarray, cfg: MarchConfig) -> jnp.ndarray:
    """Step size at distance t (raymarching.cu:11-13)."""
    return jnp.clip(t * cfg.exp_step_factor, cfg.dt_min, cfg.dt_max)


def _occ_mip_cell(
    xyz: jnp.ndarray, dt: jnp.ndarray, cfg: MarchConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mip, integer cell coords (..., 3)) of the multi-cascade grid."""
    C, G = cfg.cascades, cfg.grid_size
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    # mip_from_pos: exponent of frexp(mx) + 1 (raymarching.cu:19-23).
    _, e1 = jnp.frexp(mx)
    m1 = jnp.clip(e1 + 1, 0, C - 1)
    # mip_from_dt: exponent of frexp(dt*G) (raymarching.cu:29-32).
    _, e2 = jnp.frexp(dt * G)
    m2 = jnp.clip(e2, 0, C - 1)
    mip = jnp.maximum(m1, m2)
    mip_bound = jnp.minimum(jnp.exp2((mip - 1).astype(jnp.float32)), cfg.scale)
    n = jnp.clip(
        0.5 * (xyz / mip_bound[..., None] + 1.0) * G, 0.0, G - 1.0
    ).astype(jnp.int32)
    return mip, n


def _occ_flat_index(
    xyz: jnp.ndarray, dt: jnp.ndarray, cfg: MarchConfig
) -> jnp.ndarray:
    """(mip, cell) flat index of the multi-cascade occupancy grid."""
    G = cfg.grid_size
    mip, n = _occ_mip_cell(xyz, dt, cfg)
    return ((mip * G + n[..., 0]) * G + n[..., 1]) * G + n[..., 2]


def occupancy_lookup(
    xyz: jnp.ndarray, dt: jnp.ndarray, occ_grid: jnp.ndarray, cfg: MarchConfig
) -> jnp.ndarray:
    """Multi-cascade occupancy test.

    Args:
        xyz: (..., 3) world positions.
        dt: (...,) step sizes (selects the mip together with position).
        occ_grid: (C, G, G, G) boolean occupancy (unpacked bitfield, linear
            layout — see ops/morton.py for the layout note).
    Returns:
        (...,) boolean occupancy.
    """
    flat = _occ_flat_index(xyz, dt, cfg)
    return jnp.take(occ_grid.reshape(-1), flat, axis=0).astype(jnp.bool_)


def _occ_run_cap(cfg: MarchConfig, block: int) -> int:
    """Static bound on distinct cells a `block`-candidate stretch of a
    ray can touch at dt == dt_min: 1 + path * (|dx|+|dy|+|dz|) / cell
    <= 1 + block * dt_min * sqrt(3) * G / (2 * scale), +slack for the
    block's ray boundary. Only valid for exp_step_factor == 0 (constant
    dt); those configs are single-cascade (scale <= 0.5 -> cascades 1),
    so the flat index has no mip-switch runs either."""
    u = (
        int(
            math.ceil(
                1.0
                + block * cfg.dt_min * SQRT3 * cfg.grid_size
                / (2.0 * cfg.scale)
            )
        )
        + 16
    )
    return min(block, (u + 7) // 8 * 8)


def occupancy_lookup_runs(
    xyz: jnp.ndarray,
    dt: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    block: int = 256,
) -> jnp.ndarray:
    """(N, K) candidate occupancy via per-block run-length dedup — EXACT.

    Consecutive lattice candidates share grid cells (~cell/dt candidates
    per cell), so per block of `block` consecutive candidates only the
    run representatives gather the grid (measured: the candidate
    occupancy gather is ~40% of the whole union-march cost at bench
    shapes); results broadcast back through a one-hot MXU matmul. Blocks
    never span two rays (K is padded per ray). Falls back to the full
    gather via lax.cond if a block exceeds the static run cap, so
    exactness never depends on the data."""
    N, K = xyz.shape[:2]
    U = _occ_run_cap(cfg, block)
    flat = _occ_flat_index(xyz, dt, cfg)                 # (N, K)
    occ_flat = occ_grid.reshape(-1)
    if cfg.exp_step_factor != 0.0 or U >= block:
        return jnp.take(occ_flat, flat, axis=0).astype(jnp.bool_)
    pad = (-K) % block
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(flat[:, -1:], (N, pad))], axis=1
        )
    Kp = K + pad
    fb = flat.reshape(N * Kp // block, block)            # (R, W)
    new = jnp.concatenate(
        [jnp.ones_like(fb[:, :1], jnp.bool_), fb[:, 1:] != fb[:, :-1]],
        axis=1,
    )
    rank = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    nruns = rank[:, -1] + 1

    sortfree = occ_flat.shape[0] <= (1 << 24)  # f32-exact index range

    def dedup(_):
        hot = (
            rank[:, :, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, rank.shape + (U,), 2
            )
        )
        if sortfree:
            # run representatives -> compacted rows WITHOUT a sort: per
            # (block, run) exactly one `new` entry selects its flat cell
            # index; the f32 one-hot matmul is exact for indices < 2^24
            # (mip*G^3 + cell <= C*G^3 <= 2^24 at G<=128, C<=8) and
            # replaces the lax.sort run-compaction (~40% of the
            # candidate-occupancy cost at bench shapes)
            sel = jnp.where(hot & new[:, :, None], 1.0, 0.0)
            # precision=HIGHEST: TPU's default matmul truncates f32
            # operands to bf16 (~8 mantissa bits), which would silently
            # corrupt flat cell indices up to 2^24; HIGHEST keeps the
            # f32 exactness the <=2^24 guard relies on (same rationale
            # as hashgrid_dedup's one-hot broadcast).
            urows = jnp.einsum(
                "rwu,rw->ru", sel, fb.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
        else:
            key = jnp.where(
                new,
                jax.lax.broadcasted_iota(jnp.int32, new.shape, 1),
                block,
            )
            _, sr = jax.lax.sort(
                (key, fb), dimension=-1, num_keys=1, is_stable=False
            )
            urows = sr[:, :U]                            # (R, U)
        occ_u = jnp.take(occ_flat, urows, axis=0).astype(jnp.bfloat16)
        got = jnp.einsum(
            "rwu,ru->rw", hot.astype(jnp.bfloat16), occ_u,
            preferred_element_type=jnp.bfloat16,
        )
        return got > 0.5

    def full(_):
        return jnp.take(occ_flat, fb, axis=0).astype(jnp.bool_)

    occ = jax.lax.cond(jnp.any(nruns > U), full, dedup, None)
    return occ.reshape(N, Kp)[:, :K]


# ---------------------------------------------------------- brick occupancy

OCC_BRICK = (4, 4, 8)     # occupancy brick-row cell dims (x, y, z) = 128
OCC_BLOCK = 256           # candidates per brick-dedup block
OCC_GBLK = 32             # blocks per Pallas extract grid step


def pack_occ_bricks(occ_grid: jnp.ndarray) -> jnp.ndarray:
    """(C, G, G, G) bool -> (C*(G/4)*(G/4)*(G/8), 128) bf16 brick rows.

    Each 128-lane row holds a 4x4x8 cell brick of one cascade:
    lane = (x & 3) + 4 * (y & 3) + 16 * (z & 7). ONE row gather then
    serves every candidate in the brick — the candidate-occupancy test
    becomes a row fetch + in-VMEM lane select instead of a scalar
    gather per distinct CELL (~2.7x fewer issues: brick runs along a
    ray are max(|dx|/4+|dy|/4+|dz|/8) = 0.375x cell-crossing rate).
    bf16 values (0/1) feed the extract kernel's one-hot matmul
    directly."""
    C, G = occ_grid.shape[0], occ_grid.shape[1]
    bx, by, bz = OCC_BRICK
    o = occ_grid.reshape(C, G // bx, bx, G // by, by, G // bz, bz)
    # last-three order (zr, yr, xr) so the flattened lane is
    # (x & 3) + ((y & 3) << 2) + ((z & 7) << 4), matching the lookup
    o = jnp.transpose(o, (0, 1, 3, 5, 6, 4, 2))
    return o.reshape(-1, bx * by * bz).astype(jnp.bfloat16)


def _occ_brick_run_cap(cfg: MarchConfig, block: int) -> int:
    """Static bound on distinct occupancy BRICKS a `block`-candidate
    stretch of a ray touches at dt == dt_min: crossing rate per
    candidate <= dt_min * G / (2 * scale) * max_d(|dx|/4 + |dy|/4 +
    |dz|/8) = 0.375 * dt_min * G / (2 * scale). Same exp0/single-
    cascade validity domain as _occ_run_cap."""
    rate = 0.375 * cfg.dt_min * cfg.grid_size / (2.0 * cfg.scale)
    u = int(math.ceil(1.0 + block * rate)) + 16
    return min(block, (u + 7) // 8 * 8)


def _make_occ_extract_kernel(U: int, G: int):
    import jax.experimental.pallas as pl

    def kernel(rows_ref, rank_ref, lane_ref, out_ref):
        W = rank_ref.shape[1]
        for i in range(G):
            hot = (
                jax.lax.broadcasted_iota(jnp.int32, (U, W), 0)
                == rank_ref[pl.ds(i, 1), :]
            ).astype(jnp.bfloat16)
            # broadcast each candidate's brick row: one-hot x {0,1} rows
            r_t = jax.lax.dot_general(
                rows_ref[i, :, :], hot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                        # (128, W)
            lane_hot = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES_OCC, W), 0)
                == lane_ref[pl.ds(i, 1), :]
            )
            out_ref[pl.ds(i, 1), :] = jnp.sum(
                jnp.where(lane_hot, r_t, 0.0), axis=0, keepdims=True
            )
        return

    return kernel


LANES_OCC = 128


def occupancy_lookup_bricks(
    xyz: jnp.ndarray,
    dt: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, K) candidate occupancy via brick-row run dedup — EXACT.

    Like occupancy_lookup_runs, but dedup keys are 4x4x8 BRICKS of the
    grid (pack_occ_bricks layout): runs are ~2.7x longer than cell
    runs, one 128-lane bf16 row gather serves a whole run, and the
    per-candidate bit extraction (run one-hot matmul + lane one-hot
    select) happens in a fused Pallas kernel. Falls back to the plain
    scalar gather via lax.cond on run-cap overflow, and to
    occupancy_lookup_runs when shapes or config do not fit."""
    N, K = xyz.shape[:2]
    W = OCC_BLOCK
    U = _occ_brick_run_cap(cfg, W)
    pad = (-K) % W
    Kp = K + pad
    nb = N * Kp // W
    if (
        cfg.exp_step_factor != 0.0
        or U >= W
        or nb % OCC_GBLK != 0
    ):
        return occupancy_lookup_runs(xyz, dt, occ_grid, cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = cfg.grid_size
    bx, by, bz = OCC_BRICK
    mip, n = _occ_mip_cell(xyz, dt, cfg)
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    bk = (
        ((mip * (G // bx) + (nx >> 2)) * (G // by) + (ny >> 2))
        * (G // bz)
        + (nz >> 3)
    )                                                # (N, K) brick key
    lane = (nx & 3) + ((ny & 3) << 2) + ((nz & 7) << 4)
    flat = _occ_flat_index(xyz, dt, cfg)             # for the fallback
    occ_flat = occ_grid.reshape(-1)

    def padk(a):
        if not pad:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:, -1:], (N, pad))], axis=1
        )

    bkb = padk(bk).reshape(nb, W)
    laneb = padk(lane).reshape(nb, W)
    fb = padk(flat).reshape(nb, W)
    new = jnp.concatenate(
        [jnp.ones_like(bkb[:, :1], jnp.bool_),
         bkb[:, 1:] != bkb[:, :-1]], axis=1,
    )
    rank = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    nruns = rank[:, -1] + 1
    rows_all = pack_occ_bricks(occ_grid)             # (R3, 128) bf16

    def dedup(_):
        hot = (
            rank[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, rank.shape + (U,), 2)
        )
        # run-representative brick keys, sort-free (brick keys <
        # C * (G/4)^2 * (G/8) <= 2^18 — exact in f32 at HIGHEST)
        sel = jnp.where(hot & new[:, :, None], 1.0, 0.0)
        ubricks = jnp.einsum(
            "bwu,bw->bu", sel, bkb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        rows = jnp.take(rows_all, ubricks.reshape(-1), axis=0)
        rows = rows.reshape(nb, U, LANES_OCC)
        spec_rows = pl.BlockSpec(
            (OCC_GBLK, U, LANES_OCC), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_wide = pl.BlockSpec(
            (OCC_GBLK, W), lambda b: (b, 0), memory_space=pltpu.VMEM
        )
        got = pl.pallas_call(
            _make_occ_extract_kernel(U, OCC_GBLK),
            out_shape=jax.ShapeDtypeStruct((nb, W), jnp.float32),
            grid=(nb // OCC_GBLK,),
            in_specs=[spec_rows, spec_wide, spec_wide],
            out_specs=spec_wide,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
            interpret=interpret,
        )(rows, rank, laneb)
        return got > 0.5

    def full(_):
        return jnp.take(occ_flat, fb, axis=0).astype(jnp.bool_)

    occ = jax.lax.cond(jnp.any(nruns > U), full, dedup, None)
    return occ.reshape(N, Kp)[:, :K]


def march_rays_train(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    noise: jnp.ndarray | None = None,
) -> dict:
    """Training-time marching: dense (N, S) occupied samples per ray.

    Args:
        rays_o, rays_d: (N, 3). t1, t2: (N,) from AABB intersection
            (t1 < 0 means no hit -> zero samples, raymarching.cu:203-204).
        occ_grid: (C, G, G, G) bool.
        noise: (N,) uniform [0,1) start-jitter (custom_functions.py:83);
            None disables jitter.
    Returns dict with:
        ts, deltas: (N, S) f32 (zero on unused slots).
        valid: (N, S) bool sample mask.
        n_samples: (N,) int32 per-ray sample count (== rays_a[:, 2]).
    """
    N = rays_o.shape[0]
    S = cfg.samples_per_ray
    K = cfg.k_candidates

    t1 = t1.astype(jnp.float32)
    if noise is not None:
        t1 = jnp.where(t1 >= 0, t1 + calc_dt(t1, cfg) * noise, t1)

    k = jnp.arange(K, dtype=jnp.int32)[None, :]  # (1, K)
    t = sample_lattice(t1[:, None], k, cfg)  # (N, K)
    dt = calc_dt(t, cfg)
    in_range = (t1[:, None] >= 0) & (t >= 0) & (t < t2[:, None])

    xyz = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]  # (N, K, 3)
    occ = occupancy_lookup_bricks(xyz, dt, occ_grid, cfg)
    keep = in_range & occ

    ts, deltas, valid, n_samples = _compact_keep(t, dt, keep, S)
    return {"ts": ts, "deltas": deltas, "valid": valid, "n_samples": n_samples}


def _compact_keep(t, dt, keep, S):
    """Compact the first S kept candidates per ray into dense (N, S) slots.

    Scatter-free: XLA serializes scatter on TPU (~12M updates/s), so the
    compaction is formulated as a per-row binary search instead — slot s of
    ray r holds candidate k(r, s) = searchsorted(cumsum(keep)[r], s+1),
    which lowers to log2(K) vectorized gathers.

    ts/deltas are emitted under stop_gradient: the reference's compositor
    backward produces dL_dsigmas/dL_drgbs ONLY (volumerendering.cu:87-203,
    custom_functions.py:148-159) — without the barrier, XLA autodiff of
    the downstream compositing drags cotangents back through these gathers
    as serialized scatter-adds (measured: the batch-8192 backward tripled).
    """
    N, K = keep.shape
    within = jnp.cumsum(keep.astype(jnp.int32), axis=1)  # inclusive count
    targets = jnp.arange(1, S + 1, dtype=jnp.int32)
    k_idx = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="left")
    )(within)
    k_idx = jnp.minimum(k_idx, K - 1)
    n_samples = jnp.minimum(within[:, -1], S)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < n_samples[:, None]
    ts = jnp.where(valid, jnp.take_along_axis(t, k_idx, axis=1), 0.0)
    deltas = jnp.where(valid, jnp.take_along_axis(dt, k_idx, axis=1), 0.0)
    ts = jax.lax.stop_gradient(ts)
    deltas = jax.lax.stop_gradient(deltas)
    return ts, deltas, valid, n_samples


def _lattice_candidates(rays_o, rays_d, t1, t2, cfg, noise):
    """Shared candidate generation: jittered start, closed-form lattice,
    per-candidate dt/xyz and the in-range mask. Returns (t, dt, xyz,
    in_range), all (N, K[, 3])."""
    K = cfg.k_candidates
    t1 = t1.astype(jnp.float32)
    if noise is not None:
        t1 = jnp.where(t1 >= 0, t1 + calc_dt(t1, cfg) * noise, t1)
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    t = sample_lattice(t1[:, None], k, cfg)
    dt = calc_dt(t, cfg)
    in_range = (t1[:, None] >= 0) & (t >= 0) & (t < t2[:, None])
    xyz = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
    return t, dt, xyz, in_range


def march_rays_train_flat(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    noise: jnp.ndarray | None = None,
    budget_per_ray: int = 64,
) -> dict:
    """Training-time marching into a FLAT sample buffer (static CSR).

    The dense (N, S) layout wastes field evaluations on padding (rays have
    wildly different occupied-sample counts). This variant reproduces the
    reference's compacted CSR layout (`rays_a`, custom_functions.py:91-96)
    with a STATIC total budget B = N * budget_per_ray:

      - per-ray occupied count n_r (capped at cfg.samples_per_ray);
      - if sum(n_r) > B, every ray keeps floor(n_r * B / total) samples
        (front-truncated, matching the reference's max_samples truncation);
      - samples live in one (B,) buffer, rays contiguous (sorted ray_id),
        addressed by offsets/cap — scatter-free via per-slot binary search.

    Returns dict: ts/deltas/ray_id/valid (B,), offsets/n_samples (N,).
    """
    t, dt, xyz, in_range = _lattice_candidates(
        rays_o, rays_d, t1, t2, cfg, noise
    )
    keep = in_range & occupancy_lookup_bricks(xyz, dt, occ_grid, cfg)
    m, _ = _compact_flat_from_keep(t, dt, keep, cfg, budget_per_ray)
    return m


def march_rays_union_flat(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    occ_grids: jnp.ndarray,
    cfg: MarchConfig,
    noise: jnp.ndarray | None = None,
    budget_per_ray: int = 64,
    cap_scale: int = 1,
) -> tuple[dict, jnp.ndarray]:
    """Flat marching against K occupancy grids at once (MoE union sampling).

    The reference renders each of the K sub-NeRFs independently — K full
    marches of the SAME rays on the SAME step lattice, differing only in
    which samples each expert's bitfield keeps (ml_rendering.py:47-68).
    With a shared start jitter the K sample sets are subsets of one lattice,
    so we march ONCE against the union of the bitfields and record per-expert
    membership. The (expensive, shared-encoder) hash encode then runs on
    |union| samples instead of sum_k |expert_k| — close to a K-fold saving
    when the grids agree.

    Deliberate deviations (documented):
      1. The reference draws independent start jitter per expert; here the
         jitter is shared so the lattices coincide. The jitter is plain
         stratified sampling, so this only correlates the experts'
         Monte-Carlo noise — per-expert marginals are unchanged.
      2. BUDGETING: `budget_per_ray` (global budget B = N * budget_per_ray)
         and the `cap_scale * cfg.samples_per_ray` per-ray cap apply to the
         UNION stream, whereas the reference (and the non-union flat path)
         budgets each expert independently. When the K occupancy grids
         diverge, the union is larger than any single expert's set, so each
         expert's effective samples shrink — with FRONT-truncation of the
         buffer tail. Pass cap_scale=K (done by ml_render) to keep the
         per-ray cap expert-equivalent for free (it is just a clamp), and
         scale budget_per_ray by RenderConfig.union_budget_factor (up to K
         for exact per-expert-march equivalence, at proportional encode
         cost) when grids are expected to diverge.

    Returns (march_dict, member) where march_dict is the usual flat layout
    over the union and member is (K, B) bool — sample b belongs to expert k
    (i.e. expert k's own march would have produced it — up to the union
    budgeting in deviation 2).
    """
    t, dt, xyz, in_range = _lattice_candidates(
        rays_o, rays_d, t1, t2, cfg, noise
    )
    # candidate test against the UNION grid only (one gather per candidate
    # instead of K); per-expert membership is then resolved with K gathers
    # over just the B compacted samples — ~20x fewer occupancy lookups
    occ_union = jnp.any(occ_grids, axis=0)
    keep = in_range & occupancy_lookup_bricks(xyz, dt, occ_union, cfg)
    cfg_u = dataclasses.replace(
        cfg, samples_per_ray=cfg.samples_per_ray * cap_scale
    )
    m, flat_sel = _compact_flat_from_keep(t, dt, keep, cfg_u, budget_per_ray)
    if cfg.exp_step_factor == 0.0:
        # constant-dt lattice: recompute sample positions from the compacted
        # ts instead of gathering them out of the (N*K, 3) candidate array
        # (a 4 MB-source scalar gather measured ~2 ms/step at bench shapes);
        # the o/d takes below CSE with ml_render's own xyz reconstruction.
        sel_dt = jnp.full(m["ts"].shape, cfg.dt_min, jnp.float32)
        rid = m["ray_id"]
        sel_xyz = (
            jnp.take(rays_o, rid, axis=0)
            + m["ts"][:, None] * jnp.take(rays_d, rid, axis=0)
        )
    else:
        sel_dt = jnp.take(dt.reshape(-1), flat_sel)
        sel_xyz = jnp.take(xyz.reshape(-1, 3), flat_sel, axis=0)
    member = jax.vmap(
        lambda occ: occupancy_lookup(sel_xyz, sel_dt, occ, cfg)
    )(occ_grids) & m["valid"][None, :]
    return m, member


def _compact_flat_from_keep(t, dt, keep, cfg, budget_per_ray):
    """Compact kept lattice candidates into the flat (static-CSR) buffer.

    Returns (march_dict, flat_sel) where flat_sel (B,) is each slot's index
    into the flattened (N*K,) candidate array (for membership lookups)."""
    N, K = keep.shape
    B = N * budget_per_ray
    within = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    n_r = jnp.minimum(within[:, -1], cfg.samples_per_ray)
    total = jnp.sum(n_r)
    # proportional fair caps under the global budget; rays that hit keep at
    # least 1 sample (the bounded overflow is absorbed by truncating the
    # very end of the buffer — `ends` below is clipped to B-1)
    # float ratio avoids int32 overflow of n_r * B at large batch sizes;
    # an occasional ulp off-by-one in the floor only shifts one cap by 1
    ratio = jnp.float32(B) / jnp.maximum(total, 1).astype(jnp.float32)
    floor_cap = jnp.floor(
        n_r.astype(jnp.float32) * ratio
    ).astype(jnp.int32)
    cap = jnp.where(
        total <= B, n_r, jnp.minimum(n_r, jnp.maximum(floor_cap, 1))
    )
    bounds = jnp.cumsum(cap)  # inclusive ends
    offsets = bounds - cap
    total_c = jnp.minimum(bounds[-1], B)

    j = jnp.arange(B, dtype=jnp.int32)
    # ray id per slot: +1 at each ray's start offset, cumsum - 1. Replaces
    # a searchsorted over `bounds` (log N gathers per slot); empty rays
    # scatter onto the same slot as their successor and are skipped by the
    # cumulative count. Offsets beyond the buffer spill into slot B
    # (dropped by the [:B] view).
    starts = jnp.zeros((B + 1,), jnp.int32).at[
        jnp.minimum(offsets, B)
    ].add(1, mode="drop")
    ray_id = jnp.cumsum(starts[:B]) - 1
    ray_id = jnp.clip(ray_id, 0, N - 1)
    valid = j < total_c
    within_idx = j - offsets[ray_id]  # rank within the ray's kept samples

    # candidate index of each ray's i-th kept sample, via ONE per-ray sort
    # (kept candidates keep their order; non-kept sort to the tail) —
    # replaces a log2(K)-round binary search (11 x B gathers at K=1024).
    # t rides as a sort payload so the per-slot gathers below read from the
    # cap-sliced (N, Sc) arrays (a few MB) instead of the (N*K,) candidate
    # arrays (16 MB at bench shapes — measured 3-4x slower per issue).
    slot_rank = jnp.where(keep, within - 1, K)
    _, k_sorted, t_sorted = jax.lax.sort(
        (slot_rank,
         jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (N, K)),
         t),
        dimension=-1, num_keys=1, is_stable=False,
    )
    Sc = min(K, cfg.samples_per_ray)   # per-ray cap bounds within_idx
    wi = jnp.minimum(within_idx, Sc - 1)
    k_sel = jnp.take(k_sorted[:, :Sc].reshape(-1), ray_id * Sc + wi)
    k_sel = jnp.minimum(k_sel, K - 1)

    flat = ray_id * K + k_sel
    # stop_gradient: composite grads go to sigmas/rgbs only (see
    # _compact_keep) — otherwise the take's transpose is a scatter-add
    ts = jax.lax.stop_gradient(
        jnp.where(
            valid,
            jnp.take(t_sorted[:, :Sc].reshape(-1), ray_id * Sc + wi),
            0.0,
        )
    )
    if cfg.exp_step_factor == 0.0:
        # constant-dt lattice: no per-sample step-size gather needed
        deltas = jnp.where(valid, jnp.float32(cfg.dt_min), 0.0)
    else:
        deltas = jax.lax.stop_gradient(
            jnp.where(valid, jnp.take(dt.reshape(-1), flat), 0.0)
        )
    return {
        "ts": ts,
        "deltas": deltas,
        "ray_id": ray_id,
        "valid": valid,
        "offsets": offsets,
        "cap": cap,
        "n_samples": cap,
        "total": total_c,
    }, flat


def march_rays_test_flat(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cursor: jnp.ndarray,
    t2: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    alive: jnp.ndarray,
    k_block: int = 256,
    cap_per_ray: int = 64,
    budget_per_ray: int = 16,
) -> dict:
    """One test-time marching block into the FLAT (static-CSR) layout.

    The dense test block (march_rays_test_block) spends a full (N, S)
    field evaluation per iteration whether rays are alive or not. Here
    the kept samples of ALIVE rays compact into a single (N *
    budget_per_ray,) buffer — the static budget REDISTRIBUTES to the
    surviving rays (a lone alive ray can consume up to `cap_per_ray`
    samples per iteration), so total field evaluations track the samples
    actually composited instead of N x S x iterations. Rays whose kept
    samples exceed their grant simply resume at the next iteration: the
    cursor advances past the LAST CONSUMED sample only (the reference's
    hits_t cursor semantics, raymarching.cu:390).

    Returns the flat march dict (ts/deltas/ray_id/valid/offsets/cap)
    plus new_cursor (N,) and kept (N,) — the uncapped in-window count.
    """
    N = rays_o.shape[0]
    K = k_block
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    t = sample_lattice(cursor[:, None], k, cfg)          # (N, K)
    dt = calc_dt(t, cfg)
    in_range = alive[:, None] & (cursor[:, None] >= 0) & (t < t2[:, None])
    xyz = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
    keep = in_range & occupancy_lookup_bricks(xyz, dt, occ_grid, cfg)
    cfg_c = dataclasses.replace(cfg, samples_per_ray=cap_per_ray)
    m, flat_sel = _compact_flat_from_keep(t, dt, keep, cfg_c, budget_per_ray)
    B = N * budget_per_ray

    kept = jnp.sum(keep.astype(jnp.int32), axis=1)       # (N,)
    granted = m["cap"]
    offsets = m["offsets"]
    # under saturation the min-1-cap bump can push sum(cap) past B, so a
    # ray's granted slots may spill past the buffer end and never reach the
    # compositor. Advance the cursor by what was actually CONSUMED — the
    # granted slots that landed inside [0, total_c) — never by `granted`.
    consumed = jnp.clip(
        jnp.minimum(offsets + granted, m["total"])
        - jnp.minimum(offsets, m["total"]),
        0,
    )
    last_slot = jnp.clip(offsets + consumed - 1, 0, B - 1)
    k_last = jnp.take(flat_sel, last_slot) - jnp.arange(
        N, dtype=jnp.int32
    ) * K
    # truncated rays (budget, per-ray cap, or buffer spill) resume right
    # after the last consumed sample; fully-consumed (or empty) windows
    # advance past all K candidates
    next_idx = jnp.where(consumed >= kept, K, k_last + 1)
    new_cursor = jnp.minimum(sample_lattice(cursor, next_idx, cfg), t2)
    # rays whose every granted slot spilled past the buffer consumed
    # nothing: leave the cursor untouched so the window retries next
    # iteration (progress is still guaranteed — the first alive ray with
    # kept > 0 has offsets == 0 and always consumes)
    new_cursor = jnp.where((consumed == 0) & (kept > 0), cursor, new_cursor)
    new_cursor = jnp.where(alive, new_cursor, cursor)
    return {**m, "new_cursor": new_cursor, "kept": kept,
            "consumed": jnp.where(alive, consumed, 0)}


def march_rays_test_block(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cursor: jnp.ndarray,
    t2: jnp.ndarray,
    occ_grid: jnp.ndarray,
    cfg: MarchConfig,
    n_samples: int,
    k_block: int = 512,
) -> dict:
    """One block of test-time marching (twin of vren.raymarching_test).

    From each ray's persistent `cursor` t, examine the next `k_block` lattice
    candidates and compact the first `n_samples` occupied ones. The returned
    `new_cursor` resumes exactly where the CUDA kernel would
    (raymarching.cu:390: t advanced past the last taken sample, or past the
    last examined candidate).

    NOTE the reference's test kernel passes `cascades` where calc_dt expects
    `scale` (raymarching.cu:370 — quirk #3 in SURVEY.md §8). We deliberately
    use `scale`, i.e. the *corrected* schedule; for the headline configs
    (scale 0.5, cascades 1) the clamp bound differs only in unbounded scenes.

    Returns dict with ts/deltas/valid (N, n_samples) and new_cursor (N,).
    """
    N = rays_o.shape[0]
    S = n_samples
    K = k_block

    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    t = sample_lattice(cursor[:, None], k, cfg)  # (N, K)
    dt = calc_dt(t, cfg)
    in_range = (cursor[:, None] >= 0) & (t < t2[:, None])
    xyz = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
    occ = occupancy_lookup_bricks(xyz, dt, occ_grid, cfg)
    keep = in_range & occ

    ts, deltas, valid, got = _compact_keep(t, dt, keep, S)
    within = jnp.cumsum(keep.astype(jnp.int32), axis=1)

    # Cursor: lattice index right after the S-th occupied candidate, or K if
    # the block was exhausted. t at that index is the next start.
    took_all = within[:, -1] >= S
    # index of the S-th occupied candidate = argmax(within == S & keep)
    idx_s = jnp.argmax((within == S) & keep, axis=1)
    next_idx = jnp.where(took_all, idx_s + 1, K)
    new_cursor = sample_lattice(cursor, next_idx, cfg)
    new_cursor = jnp.where(
        jnp.minimum(new_cursor, t2) == new_cursor, new_cursor, t2
    )
    return {
        "ts": ts,
        "deltas": deltas,
        "valid": valid,
        "n_eff": got,
        "new_cursor": new_cursor,
    }
