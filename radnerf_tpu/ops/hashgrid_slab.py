"""Slab-layout hash-grid encode: adjacent-corner table layout.

TPU gathers are ISSUE-RATE bound (~100M issues/s on v5e regardless of
fetched bytes — docs/PERF_NOTES.md), and the round-2 encode pays one issue
per (level, point, corner). This module changes the TABLE LAYOUT so that
the 8 corners of a trilinear cell sit in a 2x2x2 pattern of ADJACENT flat
positions: rows (k, k+1, k+C, k+C+1) per z-corner. Measured
(examples/bench_gather_shapes.py), XLA multi-element slice gathers
collapse to <1M issues/s on v5e, so the FORWARD still fetches with scalar
u32 gathers; the layout's payoff is the BACKWARD: one sort entry covers
the x-corner PAIR (rows k, k+1), halving the sorted-stream element count
at the same payload words, and the windowed Pallas kernel applies a
two-row two-hot per entry.

Addressing (per level; u32 math; C = lanes, R = T // C rows):
  DENSE class ((res+1)^3 <= T; C = max(res+1, 128)):
      q = y + (res+1) * z          m = x            -- injective, exact
  HASHED class (C = min(1024, T // 64)):
      q = (y + psi_l(z) + (x >> log2 C)) mod (R-1)  m = x mod C
  entry flat index = q * C + m; the 2x2 slab at (q, m) covers corners
  (x, x+1) x (y, y+1); the z+1 corners use q' at psi_l(z+1).

This is a DIFFERENT spatial hash than tcnn's xor-multiply (deliberate,
documented deviation — reference models/networks.py:42-55 semantics are
kept by ops/hashgrid.py's 'xor' family): x/y adjacency must be linear in
the layout for slab fetches. psi_l is a per-level multiply-xor scramble of
z, so collision partners are per-z-pair random translations rather than a
global lattice symmetry. Coarse levels stay injective (collision-free,
like tcnn's dense levels). Wrap/boundary semantics are exact by
construction: the operand carries 2 pad lanes holding the NEXT row's first
two entries, so a slab at m = C-1 reads flat h+1 — the same entry the
backward scatters to. The single (q = R-2, m = C-1, y+1, x+1) corner per
level (~2e-6 of reads) reads entry 0 while its gradient is dropped into
the slab's spare row; documented inexactness.

Backward: one sort entry per (point, level, z-corner, y-corner) — key =
(q + yc) * C + m covering the x-PAIR of rows (k, k+1) — with both
features' (x0, x1) values f16x2-packed into two u32 payloads (per-level
power-of-two loss scale, as ops/hashgrid_window.py). The stream is 4N per
level instead of 8N with the same total payload words, and the windowed
Pallas kernel applies a two-row two-hot per entry
(hashgrid_window.sorted_table_grad_window_pair).

Tables remain (L, T, F) parameters; checkpoints are tied to the impl that
trained them (the flat order is the slab layout, not tcnn's).
bfloat16-compute only (the packed-u32 fetch path); f32 compute should use
the 'window'/'dedup' impls.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .hashgrid import HashGridConfig, _cm_out
from .hashgrid_window import hashgrid_table_grad_window_pair

_PSI_MUL1 = np.uint32(2654435761)
_PSI_MUL2 = np.uint32(805459861)
_PSI_SALT = np.uint32(0x9E3779B9)


@dataclasses.dataclass(frozen=True)
class _LevelAddr:
    """Static addressing constants of one level."""

    level: int
    res: int          # corner coords span [0, res]
    dense: bool
    C: int            # lanes
    R: int            # rows (T // C)
    log2C: int        # only used when C is a power of two (hashed class)


def level_addrs(cfg: HashGridConfig) -> list[_LevelAddr]:
    T = cfg.table_size
    C_h = min(1024, max(128, T // 64))
    out = []
    for lvl, res in enumerate(cfg.level_resolutions()):
        res = int(res)
        # injective ("dense") needs (res+1)^2 rows of C lanes: q ranges to
        # (res+1)^2 - 1 and the slab reads q+1. Prefer C=128 (lane-aligned
        # operand); fall back to C=res+1 (e.g. res 64 at T=2^19).
        C = next(
            (c for c in (max(res + 1, 128), res + 1)
             if c * (res + 1) ** 2 <= T),
            None,
        )
        if C is not None:
            out.append(_LevelAddr(lvl, res, True, C, T // C, 0))
        else:
            out.append(
                _LevelAddr(lvl, res, False, C_h, T // C_h,
                           int(C_h).bit_length() - 1)
            )
    return out


def _groups(addrs: list[_LevelAddr]) -> list[list[_LevelAddr]]:
    """Group levels sharing (C, dense-ness) for stacked gathers."""
    by_key: dict[tuple, list[_LevelAddr]] = {}
    for a in addrs:
        by_key.setdefault((a.C, a.dense), []).append(a)
    return list(by_key.values())


def _psi(z: jnp.ndarray, level: int) -> jnp.ndarray:
    """Per-level multiply-xor scramble of the z corner coordinate (u32)."""
    s = z.astype(jnp.uint32) * _PSI_MUL1 + jnp.uint32(
        (int(_PSI_SALT) * (level + 1)) & 0xFFFFFFFF
    )
    s = s ^ (s >> jnp.uint32(16))
    s = s * _PSI_MUL2
    return s ^ (s >> jnp.uint32(13))


def _qm(a: _LevelAddr, xi, yi, zi, zc: int):
    """Row q and lane m (u32) of the slab base for z-corner zc."""
    xu = xi.astype(jnp.uint32)
    yu = yi.astype(jnp.uint32)
    zu = (zi + zc).astype(jnp.uint32)
    if a.dense:
        q = yu + jnp.uint32(a.res + 1) * zu
        m = xu
    else:
        q = (yu + _psi(zu, a.level) + (xu >> jnp.uint32(a.log2C))) % (
            jnp.uint32(a.R - 1)
        )
        m = xu & jnp.uint32(a.C - 1)
    return q, m


def _geometry(x: jnp.ndarray, cfg: HashGridConfig, levels: list[int]):
    """floor coords (3 x (G, N) int32) + frac ((G, 3, N) f32) per level."""
    scales = jnp.asarray(cfg.level_scales()[levels])      # (G,)
    xt = jnp.transpose(x)                                 # (3, N)
    pos = xt[None, :, :] * scales[:, None, None] + 0.5    # (G, 3, N)
    pos_i = jnp.floor(pos)
    frac = (pos - pos_i).astype(jnp.float32)
    pos_i = pos_i.astype(jnp.int32)
    return pos_i[:, 0], pos_i[:, 1], pos_i[:, 2], frac


def _pad128(x: jnp.ndarray):
    N = x.shape[0]
    pad = (-N) % 128
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad, 3))], axis=0)
    return x, N


def _unpack_bf16(g: jnp.ndarray):
    lo = jax.lax.bitcast_convert_type(
        (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (g >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    )
    return lo, hi


def _encode_group(packed_flat, xp, cfg, group: list[_LevelAddr]):
    """Forward of one group: (Lg, N) f0/f1 f32 feature planes.

    One SCALAR u32 gather per (level, point, corner) from the (L*T,)
    packed table — measured (examples/bench_gather_shapes.py): scalar
    gathers run at ~100M issues/s on v5e while any multi-element slice
    gather collapses to <1M issues/s, so the slab layout's win lives in
    the BACKWARD (x-pair sort stream), not in slab-shaped fetches."""
    Lg = len(group)
    C = group[0].C
    T = cfg.table_size
    N = xp.shape[0]
    levels = [a.level for a in group]
    xi, yi, zi, frac = _geometry(xp, cfg, levels)

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]      # (Lg, N)
    acc0 = jnp.zeros((Lg, N), jnp.float32)
    acc1 = jnp.zeros((Lg, N), jnp.float32)
    lvl_off = jnp.asarray(
        [a.level * T for a in group], jnp.uint32
    )[:, None]                                           # (Lg, 1)
    for zc in (0, 1):
        wz = fz if zc else (1.0 - fz)
        qs, ms = [], []
        for gi, a in enumerate(group):
            q, m = _qm(a, xi[gi], yi[gi], zi[gi], zc)
            qs.append(q)
            ms.append(m)
        q = jnp.stack(qs)                                # (Lg, N)
        m = jnp.stack(ms)
        for yr in (0, 1):
            wy = fy if yr else (1.0 - fy)
            base = (q + jnp.uint32(yr)) * jnp.uint32(C) + m
            for xr in (0, 1):
                wx = fx if xr else (1.0 - fx)
                # clamp the single boundary corner (q=R-2, m=C-1, yr=xr=1)
                # whose additive address lands on T — its gradient is
                # dropped into the spare slab row by the backward, so the
                # forward reads entry T-1 (documented ~2e-6 inexactness;
                # an unclamped index would hit jnp.take's OOB fill, whose
                # u32 sentinel unpacks to bf16 NaN)
                flat = (
                    lvl_off
                    + jnp.minimum(base + jnp.uint32(xr), jnp.uint32(T - 1))
                ).astype(jnp.int32)
                g = jnp.take(packed_flat, flat.reshape(-1)).reshape(Lg, N)
                lo, hi = _unpack_bf16(g)
                w = wz * wy * wx
                acc0 = acc0 + w * lo.astype(jnp.float32)
                acc1 = acc1 + w * hi.astype(jnp.float32)
    return acc0, acc1


def hashgrid_encode_slab_fwd_impl(
    table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig
) -> jnp.ndarray:
    """Non-differentiable slab forward. Returns (N, L*F) bf16-accurate
    features (level-major, like every other encode impl)."""
    L, T, F = table.shape
    assert F == 2
    packed = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16), jnp.uint32
    ).reshape(-1)                                        # (L*T,)
    xp, N = _pad128(x)
    out0 = [None] * L
    out1 = [None] * L
    for group in _groups(level_addrs(cfg)):
        o0, o1 = _encode_group(packed, xp, cfg, group)
        for gi, a in enumerate(group):
            out0[a.level], out1[a.level] = o0[gi], o1[gi]
    p0 = jnp.stack(out0)[:, :N].astype(jnp.bfloat16)
    p1 = jnp.stack(out1)[:, :N].astype(jnp.bfloat16)
    return _cm_out(p0, p1)


def hashgrid_encode_slab_ref(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Slow reference with the SAME slab addressing: one scalar gather per
    corner, differentiable via XLA scatter-add autodiff. Ground truth for
    the fast path's tests (the xor-family impls use a different hash, so
    outputs are NOT comparable across families)."""
    L, T, F = table.shape
    assert F == 2
    xp, N = _pad128(x)
    t0 = table[..., 0].astype(compute_dtype)
    t1 = table[..., 1].astype(compute_dtype)
    out0 = [None] * L
    out1 = [None] * L
    for group in _groups(level_addrs(cfg)):
        C = group[0].C
        levels = [a.level for a in group]
        xi, yi, zi, frac = _geometry(xp, cfg, levels)
        for gi, a in enumerate(group):
            fx, fy, fz = frac[gi, 0], frac[gi, 1], frac[gi, 2]
            a0 = jnp.zeros_like(fx, dtype=compute_dtype)
            a1 = jnp.zeros_like(fx, dtype=compute_dtype)
            for zc in (0, 1):
                q, m = _qm(a, xi[gi], yi[gi], zi[gi], zc)
                wz = fz if zc else 1.0 - fz
                for yr in (0, 1):
                    wy = fy if yr else 1.0 - fy
                    for xr in (0, 1):
                        wx = fx if xr else 1.0 - fx
                        flat = (
                            (q + jnp.uint32(yr)) * jnp.uint32(C)
                            + m + jnp.uint32(xr)
                        ).astype(jnp.int32)
                        flat = jnp.minimum(flat, T - 1)
                        w = (wz * wy * wx).astype(compute_dtype)
                        a0 = a0 + w * jnp.take(t0[a.level], flat)
                        a1 = a1 + w * jnp.take(t1[a.level], flat)
            out0[a.level], out1[a.level] = a0, a1
    p0 = jnp.stack(out0)[:, :N]
    p1 = jnp.stack(out1)[:, :N]
    return _cm_out(p0, p1)


def _bwd_streams(x: jnp.ndarray, g: jnp.ndarray, cfg: HashGridConfig):
    """Sort streams for the slab backward.

    Returns key (L, 4N) int32 and 4 value planes (L, 4N) f32:
    (f0 x-even, f0 x-odd, f1 x-even, f1 x-odd)."""
    L = cfg.n_levels
    xp, N = _pad128(x)
    Np = xp.shape[0]
    gt = jnp.transpose(g).reshape(L, 2, N).astype(jnp.float32)
    if Np != N:
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, Np - N)))
    g0, g1 = gt[:, 0], gt[:, 1]                          # (L, Np)

    keys = [None] * L
    vals = [[None] * L for _ in range(4)]
    for group in _groups(level_addrs(cfg)):
        C = group[0].C
        levels = [a.level for a in group]
        xi, yi, zi, frac = _geometry(xp, cfg, levels)
        for gi, a in enumerate(group):
            fx, fy, fz = frac[gi, 0], frac[gi, 1], frac[gi, 2]
            ks, v0e, v0o, v1e, v1o = [], [], [], [], []
            for zc in (0, 1):
                q, m = _qm(a, xi[gi], yi[gi], zi[gi], zc)
                wz = fz if zc else 1.0 - fz
                for yr in (0, 1):
                    wy = fy if yr else 1.0 - fy
                    k = (
                        (q + jnp.uint32(yr)) * jnp.uint32(C) + m
                    ).astype(jnp.int32)
                    ks.append(k)
                    we = wz * wy * (1.0 - fx)
                    wo = wz * wy * fx
                    v0e.append(we * g0[a.level])
                    v0o.append(wo * g0[a.level])
                    v1e.append(we * g1[a.level])
                    v1o.append(wo * g1[a.level])
            keys[a.level] = jnp.stack(ks).reshape(-1)
            for vi, v in enumerate((v0e, v0o, v1e, v1o)):
                vals[vi][a.level] = jnp.stack(v).reshape(-1)
    key = jnp.stack(keys)                                # (L, 4*Np)
    planes = [jnp.stack(v) for v in vals]
    return key, planes


def hashgrid_table_grad_slab(
    x: jnp.ndarray,
    g: jnp.ndarray,
    cfg: HashGridConfig,
    interpret: bool = False,
    pack_f16: bool = True,
) -> jnp.ndarray:
    """dL/dtable for the slab addressing: x-pair sort stream + two-row
    windowed Pallas accumulation. Returns (L, T, 2) f32."""
    key, (v0e, v0o, v1e, v1o) = _bwd_streams(x, g, cfg)
    return hashgrid_table_grad_window_pair(
        key, v0e, v0o, v1e, v1o, cfg.table_size,
        interpret=interpret, pack_f16=pack_f16,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_slab(cfg: HashGridConfig, interpret: bool, fw_mode: str):
    @jax.custom_vjp
    def fused(table, x):
        if fw_mode == "dedup":
            # ray-coherent run-length dedup forward (fewer gather issues
            # at coarse/mid levels) over the slab addressing
            from .hashgrid_dedup import hashgrid_encode_dedup_fwd_impl

            return hashgrid_encode_dedup_fwd_impl(
                table, x, cfg, jnp.bfloat16, addr="slab"
            )
        return hashgrid_encode_slab_fwd_impl(table, x, cfg)

    def fwd(table, x):
        return fused(table, x), (x, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        x, dtype_token = res
        dtable = hashgrid_table_grad_slab(
            x, g.astype(jnp.float32), cfg, interpret=interpret
        )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_slab(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    fw_mode: str = "dedup",
) -> jnp.ndarray:
    """Slab-layout hash-grid encode (fast TPU path; see module docstring).

    fw_mode 'dedup' composes the run-length dedup forward (exploits sample
    adjacency along rays) with the slab addressing; 'plain' is the naive
    per-corner gather forward. Both share the x-pair windowed backward.
    compute_dtype must be bfloat16 (packed-u32 fetches); other dtypes
    raise — dispatch falls back to the xor-family impls for f32. No
    gradient to x (reference RayMarcher position grads are never consumed,
    custom_functions.py:102-112)."""
    if jnp.dtype(compute_dtype) != jnp.bfloat16:
        raise ValueError("hashgrid_encode_slab is bfloat16-only")
    return _make_fused_slab(cfg, interpret, fw_mode)(table, x)
