"""Brick-layout hash-grid encode: one 128-lane row per xy-corner patch.

TPU gathers are ISSUE-RATE bound (~120M issues/s on v5e regardless of the
bytes fetched — docs/PERF_NOTES.md), so the unit of progress is the gather
ISSUE, and the way forward is to make every issue fetch a full 512-byte
row of USEFUL payload. This layout packs an 11 x 11 patch of lattice
points (121 of 128 lanes) of ONE z-slice into each table row:

    lane(x, y) = (x - 10*px) + 11 * (y - 10*py),   px = x // 10, py = y // 10

A cell's four xy-corners (x..x+1, y..y+1) then always live in ONE row
(base local coords <= 9, corners <= 10 < 11 — no boundary case at all),
and a sample's 8 trilinear corners are TWO row fetches: row(px, py, z) and
row(px, py, z+1). Corner extraction is a dense VPU multi-hot (weights
folded into a 128-lane mask — no dynamic lane indexing), measured ~free
next to the fetch (examples/bench_brick_fetch.py: 1.62 ms vs 6.48 ms for
the 8-scalar-gather forward per level at bench shapes — 4x).

Addressing (per level; R = T / 128 rows):
  DENSE class (npx * npy * (res + 2) <= R):
      row = px + npx * (py + npy * z)            -- injective, collision-free
  HASHED class:
      row = mix(px, py, z, level) & (R - 1)      -- multiply-xor mix

Deliberate deviations from tcnn's per-point xor hash (documented, like the
slab family's — reference models/networks.py:42-55 semantics live in
ops/hashgrid.py):
  * collisions happen at PATCH granularity: an 11x11x1 slab of points
    collides with ~T'/R other slabs as coherent translated blocks rather
    than as independent points. PSNR A/B vs the slab family at fixture
    scale: docs/CONVERGENCE.md.
  * lattice points on patch boundaries (x or y ≡ 0 mod 10; ~21% of
    slots) are STORED ONCE PER ADJACENT PATCH. Copies train
    independently (each receives gradients only from reads through its
    own patch), so the interpolated field is continuous within a patch
    but can carry small seams at patch boundaries (init noise is the
    same ±1e-4 scale as tcnn's, and training pulls co-observed copies
    together); quantified in the same A/B.

Backward: one sort entry per (point, level, z-corner) — key = the flat
slab base row*128 + lane0, which sorts by row — carrying the four corner
(w * wz * g) products per feature as two f16x2 payloads (per-level
power-of-two loss scale, as ops/hashgrid_window.py). The windowed Pallas
kernel builds a (tile, 256)-lane value matrix (feature-interleaved lanes
2*lane + f) and scatters whole 64-row windows with ONE one-hot MXU matmul
per window — no per-entry serial work, ~2x fewer sorted entries than the
slab x-pair stream at the same payload words.

Tables remain (L, T, 2) parameters with flat entry index row*128 + lane;
checkpoints are tied to the impl family ('brick') that trained them.
bfloat16-compute only (the packed-u32 fetch path), like 'slab'.
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

LANES = 128
PATCH = 10          # owned cells per patch axis (x, y)
PLANE = 11          # stored lattice points per patch axis (halo = 1)

_MIX1 = np.uint32(2654435761)
_MIX2 = np.uint32(805459861)
_MIX3 = np.uint32(3674653429)
_SALT = np.uint32(0x9E3779B9)
_FMIX = np.uint32(0x85EBCA6B)

TILE_SUB = 8
TILE = TILE_SUB * LANES       # sorted entries per kernel tile
WSPAN = 128                   # table rows per window add


@dataclasses.dataclass(frozen=True)
class _BrickAddr:
    """Static addressing constants of one level."""

    level: int
    res: int           # base lattice coords span [0, res]
    dense: bool
    npx: int           # patches along x (dense class)
    npy: int
    rows: int          # rows used (dense) or R (hashed)


def brick_addrs(cfg: HashGridConfig) -> list[_BrickAddr]:
    assert cfg.table_size % LANES == 0
    R = cfg.table_size // LANES
    out = []
    for lvl, res in enumerate(cfg.level_resolutions()):
        res = int(res)
        npx = res // PATCH + 1
        npy = npx
        need = npx * npy * (res + 2)       # z corners span [0, res + 1]
        if need <= R:
            out.append(_BrickAddr(lvl, res, True, npx, npy, need))
        else:
            out.append(_BrickAddr(lvl, res, False, npx, npy, R))
    return out


def _brick_row(a: _BrickAddr, px, py, zc, R: int):
    """Table row (u32) of patch (px, py) at z-slice zc."""
    if a.dense:
        return (
            px.astype(jnp.uint32)
            + jnp.uint32(a.npx)
            * (py.astype(jnp.uint32) + jnp.uint32(a.npy)
               * zc.astype(jnp.uint32))
        )
    h = (
        px.astype(jnp.uint32) * _MIX1
        ^ py.astype(jnp.uint32) * _MIX2
        ^ zc.astype(jnp.uint32) * _MIX3
    ) + jnp.uint32((int(_SALT) * (a.level + 1)) & 0xFFFFFFFF)
    h = h ^ (h >> jnp.uint32(16))
    h = h * _FMIX
    h = h ^ (h >> jnp.uint32(13))
    return h & jnp.uint32(R - 1)


def _geometry(x: jnp.ndarray, cfg: HashGridConfig, levels: list[int]):
    """floor coords (3 x (G, N) int32) + frac ((G, 3, N) f32)."""
    scales = jnp.asarray(cfg.level_scales()[levels])
    xt = jnp.transpose(x)
    pos = xt[None, :, :] * scales[:, None, None] + 0.5
    pos_i = jnp.floor(pos)
    frac = (pos - pos_i).astype(jnp.float32)
    pos_i = pos_i.astype(jnp.int32)
    return pos_i[:, 0], pos_i[:, 1], pos_i[:, 2], frac


def _patch_lane(xi, yi):
    """Patch coords + base lane of integer base coords (any int32 shape)."""
    px = xi // PATCH
    py = yi // PATCH
    lane0 = (xi - PATCH * px) + PLANE * (yi - PATCH * py)
    return px, py, lane0


def _unpack_bf16(g):
    lo = jax.lax.bitcast_convert_type(
        (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (g >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    )
    return lo, hi


def _xy_weights(frac_l):
    """The four xy-corner weights (4 x (N,) f32) in lane-offset order
    (+0, +1, +11, +12)."""
    fx, fy = frac_l[0], frac_l[1]
    return (
        (1.0 - fx) * (1.0 - fy),
        fx * (1.0 - fy),
        (1.0 - fx) * fy,
        fx * fy,
    )


_OFFS = (0, 1, PLANE, PLANE + 1)


def hashgrid_encode_brick_fwd_impl(
    table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig
) -> jnp.ndarray:
    """Non-differentiable brick forward: 2 row gathers per (level, point).

    Returns (N, L*F) bf16-accurate features (level-major)."""
    L, T, F = table.shape
    assert F == 2
    N = x.shape[0]
    R = T // LANES
    packed = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16), jnp.uint32
    ).reshape(L * R, LANES)
    addrs = brick_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 1)

    out0, out1 = [], []
    for a in addrs:
        px, py, lane0 = _patch_lane(xi[a.level], yi[a.level])
        w4 = _xy_weights(frac[a.level])
        fz = frac[a.level, 2]
        # weighted multi-hot over the four xy-corner lanes (shared by both
        # z rows) — dense VPU, no dynamic lane indexing
        W = jnp.zeros((N, LANES), jnp.float32)
        d = lanes - lane0[:, None]
        for wc, off in zip(w4, _OFFS):
            W = W + jnp.where(d == off, wc[:, None], 0.0)
        acc0 = jnp.zeros((N,), jnp.float32)
        acc1 = jnp.zeros((N,), jnp.float32)
        for zc, wz in ((0, 1.0 - fz), (1, fz)):
            r = _brick_row(a, px, py, zi[a.level] + zc, R)
            g = jnp.take(
                packed, (jnp.uint32(a.level * R) + r).astype(jnp.int32),
                axis=0,
            )                                            # (N, 128) u32
            lo, hi = _unpack_bf16(g)
            acc0 = acc0 + wz * jnp.sum(
                W * lo.astype(jnp.float32), axis=1
            )
            acc1 = acc1 + wz * jnp.sum(
                W * hi.astype(jnp.float32), axis=1
            )
        out0.append(acc0)
        out1.append(acc1)
    p0 = jnp.stack(out0).astype(jnp.bfloat16)
    p1 = jnp.stack(out1).astype(jnp.bfloat16)
    return _cm_out(p0, p1)


def hashgrid_encode_brick_ref(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Slow reference with the SAME brick addressing: one scalar gather per
    corner, differentiable via XLA scatter-add autodiff. Ground truth for
    the fast path's tests (other families hash differently — outputs are
    NOT comparable across families)."""
    L, T, F = table.shape
    assert F == 2
    R = T // LANES
    t0 = table[..., 0].astype(compute_dtype)
    t1 = table[..., 1].astype(compute_dtype)
    addrs = brick_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))

    out0, out1 = [], []
    for a in addrs:
        px, py, lane0 = _patch_lane(xi[a.level], yi[a.level])
        w4 = _xy_weights(frac[a.level])
        fz = frac[a.level, 2]
        a0 = jnp.zeros_like(fz, dtype=compute_dtype)
        a1 = jnp.zeros_like(fz, dtype=compute_dtype)
        for zc, wz in ((0, 1.0 - fz), (1, fz)):
            r = _brick_row(a, px, py, zi[a.level] + zc, R)
            base = (r * jnp.uint32(LANES)).astype(jnp.int32)
            for wc, off in zip(w4, _OFFS):
                flat = base + (lane0 + off)
                w = (wz * wc).astype(compute_dtype)
                a0 = a0 + w * jnp.take(t0[a.level], flat)
                a1 = a1 + w * jnp.take(t1[a.level], flat)
        out0.append(a0)
        out1.append(a1)
    return _cm_out(jnp.stack(out0), jnp.stack(out1))


# ---------------------------------------------------------------- backward

def _make_brick_kernel(exact: bool):
    """Kernel factory for ONE feature plane: `exact` keeps f32 matmul
    operands (test path); the fast path uses bf16 operands on the MXU
    with f32 accumulation (the values are f16-quantized sort payloads
    already — bf16 costs ~2 more mantissa bits per entry on a zero-mean
    accumulation)."""
    import os

    dbg = os.environ.get("RADNERF_BRICK_DEBUG", "")
    mdtype = jnp.float32 if (exact or dbg == "f32") else jnp.bfloat16

    def _brick_scatter_kernel(sk_ref, skc_ref, *refs):
        """Accumulate one (level, tile) block of sorted brick updates.

        sk_ref:  (1, 1, TILE_SUB, LANES) int32 — sorted flat keys
                 row * 128 + lane0 (sorted ascending => sorted by row).
        skc_ref: (1, 1, LANES, TILE_SUB) int32 — the same keys in COLUMN
                 layout (transposed by XLA outside the kernel).
        refs[:8]: value planes v{c}{f} for corner c in (+0,+1,+11,+12)
                and feature f — (1, 1, LANES, TILE_SUB) f32, column
                layout.
        refs[8] (out): (1, 2*rows_pad, LANES) f32 — the level's gradient
                as two stacked 128-lane slabs: feature-0 rows
                [0, rows_pad), feature-1 rows [rows_pad, 2*rows_pad).
                (Mosaic only supports multi-sublane dynamic slices at
                exactly 128 lanes.)

        The value matrices V_f[entry, lane0_entry + off_c] = v_cf are
        built from the COLUMN-layout refs (entry axis already on
        sublanes — no in-kernel relayouts or transposes, both measured
        hazards: per-array [:, None] relayouts cost ~2x, and in-kernel
        jnp.transpose mis-executes in some fusion contexts, crashing the
        TPU worker). Each window scatter is one canonical bf16 MXU
        matmul onehT (WSPAN, entry) @ V (entry, 128) -> (WSPAN, 128)
        plus one dynamic WSPAN-sublane add per feature. No per-entry
        serial work; windows per sub-row ~= 1 for training streams
        (~50 entries/row)."""
        v_refs, out_ref = refs[:8], refs[8]

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        rows_pad = out_ref.shape[1] // 2
        jl_lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        w_sub = jax.lax.broadcasted_iota(jnp.int32, (WSPAN, LANES), 0)

        for s in range(TILE_SUB):
            row_l = sk_ref[0, 0, s, :].reshape(1, LANES) >> 7  # lane vec
            lane0 = (skc_ref[0, 0, :, s] & 127).reshape(LANES, 1)
            d = jl_lane - lane0                     # (128, 128) broadcast
            # select in f32 (Mosaic rejects sub-word selects); cast at
            # the matmul
            V0 = jnp.zeros((LANES, LANES), jnp.float32)
            V1 = jnp.zeros((LANES, LANES), jnp.float32)
            for ci, off in enumerate(_OFFS):
                v0 = v_refs[2 * ci][0, 0, :, s].reshape(LANES, 1)
                v1 = v_refs[2 * ci + 1][0, 0, :, s].reshape(LANES, 1)
                hit = d == off
                V0 = V0 + jnp.where(hit, v0, 0.0)
                V1 = V1 + jnp.where(hit, v1, 0.0)
            V0 = V0.astype(mdtype)
            V1 = V1.astype(mdtype)
            r_lo = sk_ref[0, 0, s, 0] >> 7
            r_hi = sk_ref[0, 0, s, LANES - 1] >> 7
            base0 = (r_lo >> 3) << 3                # sublane-aligned
            n_win = (r_hi - base0) // WSPAN + 1

            def body(w, _, row_l=row_l, V0=V0, V1=V1, base0=base0):
                base = base0 + w * WSPAN
                onehT = jnp.where(
                    (row_l - base) == w_sub, 1.0, 0.0
                ).astype(mdtype)                    # (WSPAN, entry)
                # the slab carries WSPAN spare rows per feature, so the
                # last window's add (base <= R - 1) stays in bounds
                for Vf, off in ((V0, 0), (V1, rows_pad)):
                    contrib = jax.lax.dot_general(
                        onehT, Vf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                               # (WSPAN, 128)
                    out_ref[0, pl.ds(off + base, WSPAN), :] = (
                        out_ref[0, pl.ds(off + base, WSPAN), :] + contrib
                    )
                return 0

            jax.lax.fori_loop(0, n_win, body, 0)

    del dbg
    return _brick_scatter_kernel


def sorted_table_grad_brick(
    sk: jnp.ndarray,
    vals: tuple,
    table_size: int,
    interpret: bool = False,
    exact: bool = False,
) -> jnp.ndarray:
    """(L, T, 2) f32 gradient from a row-sorted brick update stream.

    sk: (L, n) int32 sorted flat keys (row*128 + lane0); vals: 8 arrays
    (L, n) f32 — corner (+0,+1,+11,+12) x feature (0,1) products.
    exact=True keeps f32 matmul operands (tests)."""
    import os

    L, n = sk.shape
    T = table_size
    R = T // LANES
    if os.environ.get("RADNERF_BRICK_DEBUG", "") == "nokernel":
        # debug: consume the sorted stream without the pallas kernel
        s = sum(jnp.sum(v, axis=1) for v in vals) + jnp.sum(
            sk.astype(jnp.float32), axis=1
        )
        return jnp.zeros((L, T, 2), jnp.float32) + s[:, None, None] * 0.0
    # always pad at least one full tile of zero-valued updates aimed at
    # each level's last real key: in-graph streams whose length ties other
    # live buffer shapes (observed at n == T) hit a TPU worker fault —
    # the extra tile (<=0.2% work) breaks the coincidence
    pad = ((-n) % TILE) + TILE
    if pad:
        sk = jnp.concatenate(
            [sk, jnp.broadcast_to(sk[:, -1:], (L, pad))], axis=1
        )
        vals = tuple(jnp.pad(v, ((0, 0), (0, pad))) for v in vals)
    n_pad = n + pad
    n_tiles = n_pad // TILE
    # WSPAN spare rows: the last window's base can sit as high as R - 1
    rows_pad = R + WSPAN
    shape4 = (L, n_tiles, TILE_SUB, LANES)

    def cols(a):
        """Column layout: the per-tile entry axis moves to sublanes (the
        kernel builds its value matrices without any in-kernel relayout
        or transpose — both measured hazards, see the kernel docstring)."""
        return a.reshape(shape4).swapaxes(2, 3)

    sk4 = sk.reshape(shape4)
    slab = pl.pallas_call(
        _make_brick_kernel(exact),
        out_shape=jax.ShapeDtypeStruct((L, 2 * rows_pad, LANES),
                                       jnp.float32),
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_SUB, LANES), lambda l, p: (l, p, 0, 0),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((1, 1, LANES, TILE_SUB), lambda l, p: (l, p, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 9,
        out_specs=pl.BlockSpec(
            (1, 2 * rows_pad, LANES), lambda l, p: (l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sk4, cols(sk), *(cols(v) for v in vals))
    if os.environ.get("RADNERF_BRICK_DEBUG", "") == "zeroout":
        # debug: execute the kernel but feed zeros downstream
        slab = slab - jax.lax.optimization_barrier(slab)
    # feature-f slab row r, lane m == table entry (r*128 + m, f)
    slab = slab.reshape(L, 2, rows_pad, LANES)[:, :, :R, :]
    return jnp.moveaxis(slab, 1, -1).reshape(L, T, 2)


def _bwd_streams(x: jnp.ndarray, g: jnp.ndarray, cfg: HashGridConfig):
    """Sort streams: key (L, 2N) int32 + 8 value planes (L, 2N) f32."""
    L = cfg.n_levels
    N = x.shape[0]
    R = cfg.table_size // LANES
    gt = jnp.transpose(g).reshape(L, 2, N).astype(jnp.float32)
    g0, g1 = gt[:, 0], gt[:, 1]
    addrs = brick_addrs(cfg)
    xi, yi, zi, frac = _geometry(x, cfg, list(range(L)))

    keys = []
    vals: list[list] = [[] for _ in range(8)]
    for a in addrs:
        px, py, lane0 = _patch_lane(xi[a.level], yi[a.level])
        w4 = _xy_weights(frac[a.level])
        fz = frac[a.level, 2]
        ks = []
        vv: list[list] = [[] for _ in range(8)]
        for zc, wz in ((0, 1.0 - fz), (1, fz)):
            r = _brick_row(a, px, py, zi[a.level] + zc, R)
            ks.append((r * jnp.uint32(LANES)).astype(jnp.int32) + lane0)
            for ci, wc in enumerate(w4):
                w = wz * wc
                vv[2 * ci].append(w * g0[a.level])
                vv[2 * ci + 1].append(w * g1[a.level])
        keys.append(jnp.stack(ks).reshape(-1))
        for i in range(8):
            vals[i].append(jnp.stack(vv[i]).reshape(-1))
    return jnp.stack(keys), [jnp.stack(v) for v in vals]


def hashgrid_table_grad_brick(
    x: jnp.ndarray,
    g: jnp.ndarray,
    cfg: HashGridConfig,
    interpret: bool = False,
    pack_f16: bool = True,
) -> jnp.ndarray:
    """dL/dtable for the brick addressing: z-corner sort stream + one-hot
    MXU windowed accumulation. Returns (L, T, 2) f32.

    pack_f16 carries the 8 per-entry products as four f16x2 u32 payloads
    (per-level power-of-two loss scale, reference-AMP-equivalent — see
    ops/hashgrid_window.py); False sorts 8 f32 payloads (exact, tests)."""
    key, v = _bwd_streams(x, g, cfg)
    if not pack_f16:
        sk, *sv = jax.lax.sort(
            (key, *v), dimension=-1, num_keys=1, is_stable=False
        )
        return sorted_table_grad_brick(
            sk, tuple(sv), cfg.table_size, interpret=interpret, exact=True
        )
    amax = jnp.max(
        functools.reduce(jnp.maximum, [jnp.abs(p) for p in v]),
        axis=1, keepdims=True,
    )
    _, e = jnp.frexp(amax)
    scale = jnp.where(
        amax > 0.0, jnp.exp2((14 - e).astype(jnp.float32)), 1.0
    )

    def pack(a, b):
        ha = jax.lax.bitcast_convert_type(
            (a * scale).astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32)
        hb = jax.lax.bitcast_convert_type(
            (b * scale).astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32)
        return ha | (hb << jnp.uint32(16))

    packed = [pack(v[2 * i], v[2 * i + 1]) for i in range(4)]
    sk, *sp = jax.lax.sort(
        (key, *packed), dimension=-1, num_keys=1, is_stable=False
    )

    def unpack(p):
        lo = jax.lax.bitcast_convert_type(
            (p & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            (p >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        return lo, hi

    sv = []
    for p in sp:
        lo, hi = unpack(p)
        sv.extend((lo, hi))
    grad = sorted_table_grad_brick(
        sk, tuple(sv), cfg.table_size, interpret=interpret
    )
    return grad * (1.0 / scale)[:, :, None]


@functools.lru_cache(maxsize=None)
def _make_fused_brick(cfg: HashGridConfig, interpret: bool):
    @jax.custom_vjp
    def fused(table, x):
        return hashgrid_encode_brick_fwd_impl(table, x, cfg)

    def fwd(table, x):
        return fused(table, x), (x, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        x, dtype_token = res
        dtable = hashgrid_table_grad_brick(
            x, g.astype(jnp.float32), cfg, interpret=interpret
        )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_brick(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Brick-layout hash-grid encode (fast TPU path; see module docstring).

    compute_dtype must be bfloat16 (packed-u32 row fetches); other dtypes
    raise — dispatch falls back to the xor-family impls for f32. No
    gradient to x (reference RayMarcher position grads are never consumed,
    custom_functions.py:102-112)."""
    if jnp.dtype(compute_dtype) != jnp.bfloat16:
        raise ValueError("hashgrid_encode_brick is bfloat16-only")
    return _make_fused_brick(cfg, interpret)(table, x)
