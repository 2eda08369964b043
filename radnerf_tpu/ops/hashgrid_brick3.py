"""Cube-brick hash-grid encode: ONE 128-lane row per 5x5x5 lattice patch.

Round-4's xy-patch brick layout (ops/hashgrid_brick.py) made the gather
unit a full 512-byte row, but a sample's 8 trilinear corners still span
TWO rows (z and z+1), so the forward costs 2 row issues per (level,
point) and the backward sorts 2 entries per (level, point). This layout
packs a 5 x 5 x 5 CUBE of lattice points (125 of 128 lanes, 4 owned
cells + one halo point per axis) into each row:

    lane(x, y, z) = (x - 4*px) + 5 * (y - 4*py) + 25 * (z - 4*pz)

A cell's base local coords are <= 3, its far corners <= 4 = PLANE-1, so
ALL EIGHT corners of any cell live in ONE row:

  * forward: ONE row gather per (level, point) — half of brick's two.
    Extraction is a dense VPU 8-offset weighted multi-hot (offsets
    {0,1,5,6,25,26,30,31}), same cost family as brick's 4-offset mask.
  * backward: ONE sorted entry per (level, point) — half the sort keys
    and half the windowed-kernel walks; each entry carries all 8 corner
    products per feature as 8 f16x2 payload words (same per-level
    power-of-two loss scale as the other families).
  * run coherence: along a ray the row changes only when the sample
    crosses a 4-cell patch boundary in SOME axis, vs brick's every
    1-cell z-step — runs are ~4x longer, which feeds the row-run dedup
    (hashgrid_encode_brick3 fw 'runs' mode) at mid/fine levels where
    brick's dedup was useless.

Addressing (per level; R = T / 128 rows):
  DENSE class ((res//4 + 1)^3 <= R):
      row = px + np * (py + np * pz)             -- injective
  HASHED class:
      row = mix(px, py, pz, level) & (R - 1)     -- multiply-xor mix

Deliberate deviations from tcnn's per-point xor hash (reference
models/networks.py:42-55 semantics live in ops/hashgrid.py):
  * collisions at CUBE-patch granularity (125-point blocks), ~1.5x more
    patches at the finest levels than the xy layout; PSNR A/B at
    fixture scale: docs/CONVERGENCE.md (round-5 row).
  * lattice points on patch faces (x, y or z == 0 mod 4; the halo) are
    stored once per adjacent patch and train independently, as in the
    xy layout (quantified in the same A/B).

Tables remain (L, T, 2) parameters; checkpoints are tied to the impl
family ('brick3') that trained them. bfloat16-compute only.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import HashGridConfig, _cm_out
from .hashgrid_brick import _geometry, _unpack_bf16

LANES = 128
PATCH = 4           # owned cells per patch axis
PLANE = 5           # stored lattice points per patch axis (halo = 1)

_MIX1 = np.uint32(2654435761)
_MIX2 = np.uint32(805459861)
_MIX3 = np.uint32(3674653429)
_SALT = np.uint32(0x9E3779B9)
_FMIX = np.uint32(0x85EBCA6B)

TILE_SUB = 8
TILE = TILE_SUB * LANES       # sorted entries per kernel tile
WSPAN = 128                   # table rows per window add
SKIP_SORT_ROWS = 1536         # levels whose padded slab fits this many
                              # rows skip the backward sort (window
                              # kernel is span-exact on unsorted input)

# corner lane offsets, (dz, dy, dx)-minor order: off = dx + 5 dy + 25 dz
_OFFS3 = tuple(
    dx + PLANE * dy + PLANE * PLANE * dz
    for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
)


@dataclasses.dataclass(frozen=True)
class _Brick3Addr:
    level: int
    res: int
    dense: bool
    np_: int           # patches along each axis (dense class)
    rows: int


def brick3_addrs(cfg: HashGridConfig) -> list[_Brick3Addr]:
    assert cfg.table_size % LANES == 0
    R = cfg.table_size // LANES
    out = []
    for lvl, res in enumerate(cfg.level_resolutions()):
        res = int(res)
        np_ = res // PATCH + 1
        need = np_ ** 3
        if need <= R:
            out.append(_Brick3Addr(lvl, res, True, np_, need))
        else:
            out.append(_Brick3Addr(lvl, res, False, np_, R))
    return out


def _brick3_row(a: _Brick3Addr, px, py, pz, R: int):
    """Table row (u32) of cube patch (px, py, pz)."""
    if a.dense:
        n = jnp.uint32(a.np_)
        return (
            px.astype(jnp.uint32)
            + n * (py.astype(jnp.uint32) + n * pz.astype(jnp.uint32))
        )
    h = (
        px.astype(jnp.uint32) * _MIX1
        ^ py.astype(jnp.uint32) * _MIX2
        ^ pz.astype(jnp.uint32) * _MIX3
    ) + jnp.uint32((int(_SALT) * (a.level + 1)) & 0xFFFFFFFF)
    h = h ^ (h >> jnp.uint32(16))
    h = h * _FMIX
    h = h ^ (h >> jnp.uint32(13))
    return h & jnp.uint32(R - 1)


def _patch_lane3(xi, yi, zi):
    """Patch coords + base lane of integer base coords."""
    px = xi // PATCH
    py = yi // PATCH
    pz = zi // PATCH
    lane0 = (
        (xi - PATCH * px)
        + PLANE * (yi - PATCH * py)
        + PLANE * PLANE * (zi - PATCH * pz)
    )
    return px, py, pz, lane0


def _corner_weights(frac_l):
    """The 8 trilinear corner weights ((N,) f32 each) in _OFFS3 order."""
    fx, fy, fz = frac_l[0], frac_l[1], frac_l[2]
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    return tuple(
        wx[dx] * wy[dy] * wz[dz]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    )


RUN_BLOCK = 1024     # samples per run-dedup block
RUN_SLACK = 64       # extra runs allowed per block (ray/segment bounds)
RUN_MAX_FRAC = 0.55  # dedup a level only when U <= this fraction of W
EXTRACT_GBLK = 8     # run-blocks per extract-kernel grid step (the
                     # Pallas block's sublane dim must be 8-divisible)


def _run_cap(res: int, block: int) -> int:
    """Static bound on distinct cube rows a `block`-sample stretch of a
    dt_min-lattice ray stream touches at level `res`: the row changes
    when the sample crosses a 4-cell patch boundary in SOME axis, at
    total rate (|dx|+|dy|+|dz|) * dt_min * res / (2 * scale * PATCH)
    <= 3 * res / (max_samples * PATCH) per sample (dt_min = 2 * scale *
    sqrt(3) / max_samples, max_samples 1024). +RUN_SLACK covers ray /
    segment boundaries inside a block and the tail pad. Streams that
    break the assumption (coarser-than-dt_min spacing, random points)
    overflow into the exact lax.cond fallback -- never wrong, only
    slower."""
    import math

    u = int(math.ceil(block * min(1.0, 3.0 * res / 4096.0))) + RUN_SLACK
    return min(block, (u + 7) // 8 * 8)


def _stencil_T(lane0, fxv, fyv, fzv, tile: int, dtype,
               exact: bool = False):
    """Transposed trilinear stencil m_T[lane, e] = ax * ay * az of shape
    (LANES, tile), entries on LANES -- buildable straight from wide
    (1, tile) inputs with no relayout.

    Fast path (exact=False): MXU-factored build. The xy part has only
    25 meaningful lane-column classes (lane % 25) and the z part 5
    (lane // 25), so instead of 14 VPU passes over (LANES, tile) it
    builds a 4-hot (32, tile) xy-weight matrix and a 2-hot (8, tile)
    z-weight matrix (~25x/16x fewer elements) and expands both through
    static one-hot bf16 matmuls Pxy (LANES, 32) / Pz (LANES, 8). Lanes
    125-127 map to z-class 5 whose weight row is identically zero, so
    the 3 unused lanes vanish automatically. The weights pass through
    bf16 (one rounding vs the f32 build; the features are bf16 anyway).
    An f32 Precision.HIGHEST variant measured SLOWER than the plain VPU
    build (6-pass f32 matmuls at K=32 stall the MXU), hence bf16-or-VPU.

    Exact path: direct (LANES, tile) f32 VPU build, bit-identical to
    (wx * wy) * wz -- the golden-test reference."""
    P2 = PLANE * PLANE
    lz0 = lane0 // P2
    if exact:
        lxy = jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0) % P2
        lzl = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0) // P2
        )
        lx = lxy % PLANE
        ly = lxy // PLANE
        lx0 = lane0 % PLANE
        ly0 = (lane0 // PLANE) % PLANE
        ax = jnp.where(
            lx == lx0, 1.0 - fxv, jnp.where(lx == lx0 + 1, fxv, 0.0)
        )
        ay = jnp.where(
            ly == ly0, 1.0 - fyv, jnp.where(ly == ly0 + 1, fyv, 0.0)
        )
        az = jnp.where(
            lzl == lz0, 1.0 - fzv, jnp.where(lzl == lz0 + 1, fzv, 0.0)
        )
        return ((ax * ay) * az).astype(dtype)

    lxy0 = lane0 % P2                                # (1, tile)
    w00 = (1.0 - fxv) * (1.0 - fyv)
    w10 = fxv * (1.0 - fyv)
    w01 = (1.0 - fxv) * fyv
    w11 = fxv * fyv
    # masks are built against f32 operands (i1 relayout between f32 and
    # bf16 tilings does not compile in Mosaic); the bf16 cast AFTER the
    # disjoint-hot sum rounds exactly one weight per position, identical
    # to quantizing the weights first
    c32 = jax.lax.broadcasted_iota(jnp.int32, (32, tile), 0)
    axy = (
        jnp.where(c32 == lxy0, w00, 0.0)
        + jnp.where(c32 == lxy0 + 1, w10, 0.0)
        + jnp.where(c32 == lxy0 + PLANE, w01, 0.0)
        + jnp.where(c32 == lxy0 + PLANE + 1, w11, 0.0)
    ).astype(jnp.bfloat16)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)
    az = jnp.where(
        c8 == lz0, 1.0 - fzv, jnp.where(c8 == lz0 + 1, fzv, 0.0)
    ).astype(jnp.bfloat16)
    pxy = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, 32), 0) % P2
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, 32), 1)
    ).astype(jnp.bfloat16)
    pz = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 0) // P2
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 1)
    ).astype(jnp.bfloat16)
    m = jax.lax.dot_general(
        pxy, axy, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jax.lax.dot_general(
        pz, az, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return m.astype(dtype)


def _make_extract_kernel(U: int, G: int, exact: bool):
    """Fused runs-mode forward extraction: per run-block, broadcast the
    U deduped table rows to samples with ONE one-hot MXU matmul and
    contract against the transposed stencil -- replacing the XLA
    broadcast einsum + (N, 128) weighted multi-hot reduction (which
    together were ~30 ms/step at bench shapes; the (B, 128) VPU passes
    were nearly half the encode forward)."""
    hdtype = jnp.float32 if exact else jnp.bfloat16
    hprec = jax.lax.Precision.HIGHEST if exact else None

    def kernel(rows_ref, rank_ref, lane0_ref, fx_ref, fy_ref, fz_ref,
               out0_ref, out1_ref):
        W = rank_ref.shape[1]
        for i in range(G):
            m_T = _stencil_T(
                lane0_ref[pl.ds(i, 1), :],
                fx_ref[pl.ds(i, 1), :],
                fy_ref[pl.ds(i, 1), :],
                fz_ref[pl.ds(i, 1), :],
                W, jnp.float32, exact=exact,
            )                                        # (LANES, W) f32
            hot = (
                jax.lax.broadcasted_iota(jnp.int32, (U, W), 0)
                == rank_ref[pl.ds(i, 1), :]
            ).astype(hdtype)                         # (U, W)
            lo, hi = _unpack_bf16(rows_ref[i, :, :])  # (U, 128) bf16
            for src, out_ref in ((lo, out0_ref), (hi, out1_ref)):
                # R_T[lane, e] = row value of e's run: one-hot x bf16,
                # every product exact, f32 accumulation
                r_t = jax.lax.dot_general(
                    src.astype(hdtype), hot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=hprec,
                )                                    # (LANES, W)
                out_ref[pl.ds(i, 1), :] = jnp.sum(
                    m_T * r_t, axis=0, keepdims=True
                )
        return

    return kernel


def _extract_runs_pallas(rows, rank, lane0, fx, fy, fz, U: int,
                         interpret: bool, exact: bool = False):
    """rows (nb, U, LANES) u32; rank/lane0 (nb, W) i32; fx/fy/fz (nb, W)
    f32. Returns two (nb, W) f32 feature planes. nb must be a multiple
    of EXTRACT_GBLK (the forward pads the sample stream accordingly)."""
    nb, W = rank.shape
    G = EXTRACT_GBLK
    assert nb % G == 0
    row_spec = pl.BlockSpec(
        (G, U, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    wide_spec = pl.BlockSpec(
        (G, W), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_extract_kernel(U, G, exact),
        out_shape=[jax.ShapeDtypeStruct((nb, W), jnp.float32)] * 2,
        grid=(nb // G,),
        in_specs=[row_spec] + [wide_spec] * 5,
        out_specs=[wide_spec] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, rank, lane0, fx, fy, fz)
    return out


def hashgrid_encode_brick3_fwd_impl(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    fw_mode: str = "runs",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Non-differentiable cube-brick forward. Returns (N, L*F)
    bf16-accurate features (level-major).

    fw_mode 'plain': ONE row gather per (level, point).
    fw_mode 'runs':  per-block run-length dedup of the row stream --
        consecutive samples share cube rows (~4 cells per patch axis),
        so only run representatives gather; rows broadcast back to
        samples inside the fused Pallas extract kernel (exact one-hot
        bf16 MXU matmul + MXU-factored stencil contraction). Levels
        whose static run cap exceeds RUN_MAX_FRAC of the block stay on
        the plain gather; a level whose stream overflows its cap falls
        back via lax.cond (identical values up to f32 summation
        order)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, T, F = table.shape
    assert F == 2
    N = x.shape[0]
    R = T // LANES
    packed = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16), jnp.uint32
    ).reshape(L * R, LANES)
    addrs = brick3_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 1)

    W_blk = RUN_BLOCK
    pad = (-N) % (W_blk * EXTRACT_GBLK)
    n_blocks = (N + pad) // W_blk

    def pad_tail(a):
        if not pad:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]
        )

    out0, out1 = [], []
    for a in addrs:
        px, py, pz, lane0 = _patch_lane3(
            xi[a.level], yi[a.level], zi[a.level]
        )
        w8 = _corner_weights(frac[a.level])
        r = (
            jnp.uint32(a.level * R)
            + _brick3_row(a, px, py, pz, R)
        ).astype(jnp.int32)                          # (N,) global row
        U = _run_cap(a.res, W_blk)
        use_runs = (
            fw_mode == "runs"
            and U <= int(W_blk * RUN_MAX_FRAC)
            and N >= W_blk
        )

        def extract_xla(lo, hi, lane0=lane0, w8=w8):
            # weighted 8-hot over the corner lanes -- dense VPU
            W = jnp.zeros((N, LANES), jnp.float32)
            d = lanes - lane0[:, None]
            for wc, off in zip(w8, _OFFS3):
                W = W + jnp.where(d == off, wc[:, None], 0.0)
            return jnp.sum(W * lo, axis=1), jnp.sum(W * hi, axis=1)

        if use_runs:
            rb = pad_tail(r).reshape(n_blocks, W_blk)
            new = jnp.concatenate(
                [jnp.ones_like(rb[:, :1], jnp.bool_),
                 rb[:, 1:] != rb[:, :-1]], axis=1,
            )
            rank = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
            nruns = rank[:, -1] + 1
            lane0b = pad_tail(lane0).reshape(n_blocks, W_blk)
            fxb = pad_tail(frac[a.level, 0]).reshape(n_blocks, W_blk)
            fyb = pad_tail(frac[a.level, 1]).reshape(n_blocks, W_blk)
            fzb = pad_tail(frac[a.level, 2]).reshape(n_blocks, W_blk)

            def dedup(_, rb=rb, new=new, rank=rank, U=U, lane0b=lane0b,
                      fxb=fxb, fyb=fyb, fzb=fzb):
                hot = (
                    rank[:, :, None]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, rank.shape + (U,), 2
                    )
                )
                # rep rows -> compacted (n_blocks, U) WITHOUT a sort;
                # HIGHEST keeps the f32 index matmul exact (global rows
                # < L*R <= 2^24; TPU default truncates to bf16)
                sel = jnp.where(hot & new[:, :, None], 1.0, 0.0)
                urows = jnp.einsum(
                    "bwu,bw->bu", sel, rb.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)
                rows = jnp.take(packed, urows.reshape(-1), axis=0)
                rows = rows.reshape(n_blocks, U, LANES)
                o0, o1 = _extract_runs_pallas(
                    rows, rank, lane0b, fxb, fyb, fzb, U, interpret
                )
                return o0.reshape(-1)[:N], o1.reshape(-1)[:N]

            def full(_, r=r):
                g = jnp.take(packed, r, axis=0)      # (N, 128) u32
                lo_f, hi_f = _unpack_bf16(g)
                return extract_xla(
                    lo_f.astype(jnp.float32), hi_f.astype(jnp.float32)
                )

            o0, o1 = jax.lax.cond(jnp.any(nruns > U), full, dedup, None)
        else:
            g = jnp.take(packed, r, axis=0)          # (N, 128) u32
            lo_b, hi_b = _unpack_bf16(g)
            o0, o1 = extract_xla(
                lo_b.astype(jnp.float32), hi_b.astype(jnp.float32)
            )
        out0.append(o0)
        out1.append(o1)
    p0 = jnp.stack(out0).astype(jnp.bfloat16)
    p1 = jnp.stack(out1).astype(jnp.bfloat16)
    return _cm_out(p0, p1)


def hashgrid_encode_brick3_ref(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Slow reference with the SAME cube-brick addressing: one scalar
    gather per corner, differentiable via XLA scatter-add autodiff.
    Ground truth for the fast path's tests."""
    L, T, F = table.shape
    assert F == 2
    R = T // LANES
    t0 = table[..., 0].astype(compute_dtype)
    t1 = table[..., 1].astype(compute_dtype)
    addrs = brick3_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))

    out0, out1 = [], []
    for a in addrs:
        px, py, pz, lane0 = _patch_lane3(
            xi[a.level], yi[a.level], zi[a.level]
        )
        w8 = _corner_weights(frac[a.level])
        r = _brick3_row(a, px, py, pz, R)
        base = (r * jnp.uint32(LANES)).astype(jnp.int32)
        a0 = jnp.zeros_like(frac[a.level, 2], dtype=compute_dtype)
        a1 = jnp.zeros_like(a0)
        for wc, off in zip(w8, _OFFS3):
            flat = base + (lane0 + off)
            w = wc.astype(compute_dtype)
            a0 = a0 + w * jnp.take(t0[a.level], flat)
            a1 = a1 + w * jnp.take(t1[a.level], flat)
        out0.append(a0)
        out1.append(a1)
    return _cm_out(jnp.stack(out0), jnp.stack(out1))


# ---------------------------------------------------------------- backward

def _make_brick3_kernel(exact: bool, packed: bool = False):
    """Kernel: `exact` keeps f32 matmul operands (test path); fast path
    uses bf16 MXU operands with f32 accumulation. `packed` takes the
    two-word payload wire format (see _bwd_streams3): sorting 2 payload
    arrays instead of 5 measurably shrinks the dominant backward sort
    (bitonic passes move every payload)."""
    mdtype = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None

    def _packed_kernel(skw_ref, pf_ref, pg_ref, out_ref, m_s):
        # s32 wire format (Mosaic has no u32<->f32 casts in-kernel);
        # bf16 grads reconstruct exactly by shifting their bits into a
        # same-width f32 bitcast (bf16 -> f32 is bit-extension)
        pf = pf_ref[0, 0, :, :]
        inv = jnp.float32(1.0 / 1023.0)
        fx = (pf & 1023).astype(jnp.float32) * inv
        fy = ((pf >> 10) & 1023).astype(jnp.float32) * inv
        fz = ((pf >> 20) & 1023).astype(jnp.float32) * inv
        pg = pg_ref[0, 0, :, :]
        hi16 = jax.lax.shift_right_logical(pg, 16) << 16
        g0 = jax.lax.bitcast_convert_type(hi16, jnp.float32)
        g1 = jax.lax.bitcast_convert_type(pg << 16, jnp.float32)
        _scatter_body(skw_ref, g0, g1, fx, fy, fz, out_ref, m_s)

    def _wide_kernel(
        skw_ref, g0w_ref, g1w_ref, fxw_ref, fyw_ref, fzw_ref, out_ref, m_s
    ):
        _scatter_body(
            skw_ref,
            g0w_ref[0, 0, :, :], g1w_ref[0, 0, :, :],
            fxw_ref[0, 0, :, :], fyw_ref[0, 0, :, :], fzw_ref[0, 0, :, :],
            out_ref, m_s,
        )

    def _scatter_body(skw_ref, g0w, g1w, fxv, fyv, fzv, out_ref, m_s):
        """Accumulate one (level, tile) block of sorted cube updates.

        Phase 1 builds the per-entry trilinear stencil TRANSPOSED --
        m_T[lane, e] = ax * ay * az, out-lanes on SUBLANES and entries
        on LANES -- in ONE set of (128, TILE) VPU ops straight from the
        wide (1, TILE) inputs. The previous design built it row-major in
        8 sub-iterations of (128, 128) ops because the entry axis had
        to sit on sublanes; that needed four extra column-layout inputs
        (XLA relayout copies, ~2.7 ms/step at bench shapes) and 8x the
        op dispatches. The output gradients g_f never enter the
        stencil: they scale the one-hot's columns in phase 2, so one
        stencil serves both features.

        skw/g0w/g1w/fxw/fyw/fzw_ref: (1, 1, 1, TILE) wide -- sorted
                 flat keys (row*128+lane0), the two feature
                 output-gradients and the three trilinear fractions,
                 entry axis on LANES.
        out_ref: (1, 2*rows_pad, LANES) f32 -- two stacked feature slabs.
        m_s: (LANES, TILE) scratch -- the TRANSPOSED stencil.

        Phase 2 scatters whole windows with ONE big g-scaled one-hot
        matmul (WSPAN, TILE) x m_T^T per feature per window (the
        dot_general contracts both operands on their LANES axis, which
        the MXU consumes without a relayout). Window span uses MIN/MAX
        of the tile's rows, so correctness never depends on the stream
        being sorted -- sorting only keeps the span short."""
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        rows_pad = out_ref.shape[1] // 2
        tile = skw_ref.shape[3]
        # transposed stencil via the MXU-factored build (see _stencil_T):
        # replaces 14 VPU passes over (LANES, TILE) with ~1/16th the
        # elementwise work plus two tiny one-hot matmuls
        m_s[...] = _stencil_T(
            skw_ref[0, 0, :, :] & 127,
            fxv, fyv, fzv,
            tile, mdtype, exact=exact,
        )

        row_e = skw_ref[0, 0, :, :] >> 7            # (1, TILE)
        w_sub = jax.lax.broadcasted_iota(jnp.int32, (WSPAN, tile), 0)
        r_lo = jnp.min(row_e)
        r_hi = jnp.max(row_e)
        base0 = (r_lo >> 3) << 3                    # sublane-aligned
        n_win = (r_hi - base0) // WSPAN + 1

        def body(w, _):
            base = base0 + w * WSPAN
            hit = (row_e - base) == w_sub           # (WSPAN, TILE)
            for gw, off in ((g0w, 0), (g1w, rows_pad)):
                onehg = jnp.where(hit, gw, 0.0).astype(mdtype)
                contrib = jax.lax.dot_general(
                    onehg, m_s[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )                                   # (WSPAN, 128)
                out_ref[0, pl.ds(off + base, WSPAN), :] = (
                    out_ref[0, pl.ds(off + base, WSPAN), :] + contrib
                )
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)

    return _packed_kernel if packed else _wide_kernel


def sorted_table_grad_brick3(
    sk: jnp.ndarray,
    vals: tuple,
    table_size: int,
    interpret: bool = False,
    exact: bool = False,
) -> jnp.ndarray:
    """(L, T, 2) f32 gradient from a row-sorted cube update stream.

    sk: (L, n) int32 sorted flat keys (row*128 + lane0); vals: 5 arrays
    (L, n) f32 — (fx, fy, fz, g0, g1): the trilinear fractions and the
    two feature output-gradients per entry. The 8 corner products are
    NEVER materialized: the per-entry V row factors as

        V_f[e, lane] = ax[e,lane] * ay[e,lane] * az[e,lane] * g_f[e]

    where ax = (lx_lane == lx0_e) ? (1-fx) : (lx_lane == lx0_e+1) ? fx
    : 0 against the STATIC per-lane cube coordinates lx = lane % 5,
    ly = (lane // 5) % 5, lz = lane // 25.

    vals may instead be the PACKED 2-word wire format (fast path, see
    _bwd_streams3 packed=True): (pf u32 = fx10|fy10|fz10, pg u32 =
    g0.bf16 << 16 | g1.bf16) — at 12-level x 328k bench streams the
    backward bitonic sort was ~27%% of the whole train step and its
    cost DOES scale with payload count at these sizes, so the fast
    path sorts 2 payload words instead of 5 (fracs quantized to 10
    bits, grads to bf16 — both at/beyond the bf16 stencil precision
    the fast path already carries)."""
    L, n = sk.shape
    T = table_size
    R = T // LANES
    # pad one extra tile of zero-valued updates aimed at each level's
    # last real key (shape-coincidence hazard — see xy-brick)
    pad = ((-n) % TILE) + TILE
    if pad:
        sk = jnp.concatenate(
            [sk, jnp.broadcast_to(sk[:, -1:], (L, pad))], axis=1
        )
        vals = tuple(jnp.pad(v, ((0, 0), (0, pad))) for v in vals)
    n_pad = n + pad
    n_tiles = n_pad // TILE
    rows_pad = R + WSPAN

    vdtype = jnp.float32 if exact else jnp.bfloat16

    def wide(a):
        return a.reshape(L, n_tiles, 1, TILE)

    packed = len(vals) == 2
    wide_spec = pl.BlockSpec(
        (1, 1, 1, TILE), lambda l, p: (l, p, 0, 0),
        memory_space=pltpu.VMEM,
    )
    operands = [wide(sk)] + [wide(v) for v in vals] if packed else None
    if not packed:
        fx, fy, fz, g0, g1 = vals
        operands = [wide(sk), wide(g0), wide(g1),
                    wide(fx), wide(fy), wide(fz)]
    slab = pl.pallas_call(
        _make_brick3_kernel(exact, packed=packed),
        out_shape=jax.ShapeDtypeStruct((L, 2 * rows_pad, LANES),
                                       jnp.float32),
        grid=(L, n_tiles),
        in_specs=[wide_spec] * len(operands),
        out_specs=pl.BlockSpec(
            (1, 2 * rows_pad, LANES), lambda l, p: (l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((LANES, TILE), vdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    slab = slab.reshape(L, 2, rows_pad, LANES)[:, :, :R, :]
    return jnp.moveaxis(slab, 1, -1).reshape(L, T, 2)


def _bwd_streams3(x: jnp.ndarray, g: jnp.ndarray, cfg: HashGridConfig,
                  packed: bool = False):
    """Sort streams: key (L, N) int32 + payloads (L, N).

    packed=False: 5 f32 planes (fx, fy, fz, g0, g1).
    packed=True (fast path): 2 u32 planes — pf = fx10 | fy10<<10 |
    fz10<<20 (round(frac * 1023)) and pg = g0.bf16<<16 | g1.bf16 —
    so the dominant backward sort moves 2 payload words per entry
    instead of 5 (see sorted_table_grad_brick3)."""
    L = cfg.n_levels
    N = x.shape[0]
    R = cfg.table_size // LANES
    gt = jnp.transpose(g).reshape(L, 2, N).astype(jnp.float32)
    g0, g1 = gt[:, 0], gt[:, 1]
    addrs = brick3_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))

    keys = []
    for a in addrs:
        px, py, pz, lane0 = _patch_lane3(
            xi[a.level], yi[a.level], zi[a.level]
        )
        r = _brick3_row(a, px, py, pz, R)
        keys.append((r * jnp.uint32(LANES)).astype(jnp.int32) + lane0)
    key = jnp.stack(keys)
    if not packed:
        return key, (frac[:, 0], frac[:, 1], frac[:, 2], g0, g1)

    def q10(f):
        return jnp.round(f * 1023.0).astype(jnp.int32)

    pf = q10(frac[:, 0]) | (q10(frac[:, 1]) << 10) | (q10(frac[:, 2]) << 20)
    to16 = lambda a: jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.int32)
    pg = (to16(g0) << 16) | to16(g1)
    return key, (pf, pg)


def hashgrid_table_grad_brick3(
    x: jnp.ndarray,
    g: jnp.ndarray,
    cfg: HashGridConfig,
    interpret: bool = False,
    exact: bool = False,
) -> jnp.ndarray:
    """dL/dtable for the cube-brick addressing. Returns (L, T, 2) f32.

    Sorts (key, fx, fy, fz, g0, g1) — raw f32 payloads, no f16 packing
    or loss-scaling (payload count does not change TPU sort cost, and
    the axis-factored V build never materializes corner products).

    Coarse DENSE levels (few table rows) skip the sort entirely: the
    window kernel spans MIN/MAX of each tile's rows, so unsorted
    streams are exact — they just walk more windows, and for a level
    whose whole slab is <= SKIP_SORT_ROWS rows the extra window matmuls
    cost far less than its share of the batched (L, n) bitonic sort
    (~1.2 ms/level at bench shapes).

    `exact` keeps f32 matmul operands in the window kernel (tests) and
    the full 5-plane f32 payload wire format; the fast path sorts the
    2-word packed payloads."""
    key, v = _bwd_streams3(x, g, cfg, packed=not exact)
    rows_per_level = [a.rows for a in brick3_addrs(cfg)]
    # resolutions grow monotonically, so the skip set is a prefix
    ls = sum(1 for r in rows_per_level if r + WSPAN <= SKIP_SORT_ROWS)
    if 0 < ls < cfg.n_levels:
        sk_hi, *sv_hi = jax.lax.sort(
            (key[ls:], *(p[ls:] for p in v)),
            dimension=-1, num_keys=1, is_stable=False,
        )
        sk = jnp.concatenate([key[:ls], sk_hi])
        sv = [
            jnp.concatenate([p[:ls], ph])
            for p, ph in zip(v, sv_hi)
        ]
    else:
        sk, *sv = jax.lax.sort(
            (key, *v), dimension=-1, num_keys=1, is_stable=False
        )
    return sorted_table_grad_brick3(
        sk, tuple(sv), cfg.table_size, interpret=interpret, exact=exact
    )



@functools.lru_cache(maxsize=None)
def _make_fused_brick3(cfg: HashGridConfig, interpret: bool,
                       fw_mode: str = "runs"):
    @jax.custom_vjp
    def fused(table, x):
        return hashgrid_encode_brick3_fwd_impl(
            table, x, cfg, fw_mode, interpret=interpret or None
        )

    def fwd(table, x):
        return fused(table, x), (x, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        x, dtype_token = res
        dtable = hashgrid_table_grad_brick3(
            x, g.astype(jnp.float32), cfg, interpret=interpret
        )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_brick3(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    fw_mode: str = "runs",
) -> jnp.ndarray:
    """Cube-brick hash-grid encode (fast TPU path; see module docstring).

    bfloat16-only (packed-u32 row fetches). fw_mode 'runs' (default)
    dedups ray-coherent row runs before gathering; 'plain' is one gather
    per (level, point) — the right mode for spatially-incoherent point
    sets (density-grid updates). No gradient to x (reference RayMarcher
    position grads are never consumed)."""
    if jnp.dtype(compute_dtype) != jnp.bfloat16:
        raise ValueError("hashgrid_encode_brick3 is bfloat16-only")
    return _make_fused_brick3(cfg, interpret, fw_mode)(table, x)
