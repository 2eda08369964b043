"""Ray-coherent run-length dedup for the hash-grid encode.

The hash-grid gather is issue-rate bound on TPU (~100M gathered rows/s on
v5e regardless of row width — docs/PERF_NOTES.md), and the training stream
is points x levels x 8 corners. But marched samples arrive in RAY ORDER:
consecutive samples along a ray fall in the SAME voxel at every level whose
voxel size exceeds the step (at level resolution res, the expected run
length is ~ (1/res)/dt samples). This module exploits that coherence:

  per block of W consecutive samples, per level:
    1. detect voxel-run starts (pos_i != previous pos_i) — dense VPU ops;
    2. compact the <= U run representatives per block with a tiny
       length-W lax.sort (runs of a block can never exceed W, and the
       static cap U is chosen per level from the expected run length);
    3. gather the 8 corner features ONLY for the unique voxels — the
       issue count drops from 8*N to 8*N*U/W at coarse levels;
    4. broadcast back to samples with a one-hot (W x U) matmul (MXU) and
       apply the per-sample trilinear weights.

  EXACTNESS: dedup only merges samples whose integer voxel coords are
  identical, so the result is bit-identical to the full gather — blocks
  need not align with rays (a block spanning two rays just breaks a run).
  If any block's run count exceeds the cap U for a level group, that group
  falls back to the full per-sample gather via lax.cond (both branches
  produce the same (per-level feature planes) shape), so overflow costs
  speed, never correctness.

The backward applies the same structure in reverse: per-sample cotangents
are reduced onto the unique-voxel stream by the transposed one-hot matmul
(dense), and only the reduced stream goes through the sort + windowed
Pallas scatter of ops/hashgrid_window.py.

Reference semantics being reproduced: tinycudann hash-grid encoding
(models/networks.py:42-55), same indexing as ops/hashgrid.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .hashgrid import _PRIMES, HashGridConfig, _cm_out
from .hashgrid_window import sorted_table_grad_window

BLOCK = 256         # W: samples per dedup block
_DT_REF = math.sqrt(3.0) / 1024.0   # reference dt_min (raymarching.cu:11)


def level_caps(cfg: HashGridConfig, block: int = BLOCK,
               dt_ref: float = _DT_REF) -> tuple[int, ...]:
    """Static per-level unique-voxel caps U_l for a W-sample block.

    A W-sample block covers a path of <= W*dt (normalized [0,1] coords;
    dt_ref is the reference dt_min, raymarching.cu:11). Along that path a
    level of resolution `res` is crossed at most res*path*(|dx|+|dy|+|dz|)
    <= res*path*sqrt(3) times — the DIAGONAL worst case, so caps rarely
    overflow (overflow falls back exactly via lax.cond). The +16 slack
    absorbs ray boundaries inside a block and start jitter. Large blocks
    amortize the worst-case bound: U/W -> res*sqrt(3)*dt as W grows.

    Levels whose cap reaches 90% of W gain nothing and are marked U = W
    (grouped together and routed to the plain per-sample gather)."""
    caps = []
    for res in cfg.level_resolutions():
        u = int(block * float(res) * math.sqrt(3.0) * dt_ref) + 16
        u = ((u + 7) // 8) * 8
        caps.append(block if u >= 0.9 * block else u)
    return tuple(caps)


def _group_levels(caps: tuple[int, ...], block: int):
    """Group consecutive levels by cap value; levels with cap == block use
    the plain gather (no dedup win possible). Returns list of
    (level_indices, U) with U < block, plus the list of plain levels."""
    groups: list[tuple[list[int], int]] = []
    plain: list[int] = []
    for lvl, u in enumerate(caps):
        if u >= block:
            plain.append(lvl)
        elif groups and groups[-1][1] == u:
            groups[-1][0].append(lvl)
        else:
            groups.append(([lvl], u))
    return groups, plain


def _level_consts(cfg: HashGridConfig, levels: list[int]):
    """Per-level static constants as (G, 1, 1) arrays for broadcasting."""
    scales = cfg.level_scales()[levels]
    res = cfg.level_resolutions()[levels].astype(np.int64)
    dense = cfg.level_is_dense()[levels]
    return (
        jnp.asarray(scales)[:, None, None],
        jnp.asarray(res.astype(np.int32))[:, None, None],
        jnp.asarray(dense)[:, None, None],
        jnp.asarray(np.asarray(levels, np.int32))[:, None, None],
    )


def _corner_rows(cx, cy, cz, res, dense, lvl, cfg: HashGridConfig):
    """Table row (with level offset) of integer corner coords.

    cx/cy/cz: int32 arrays (...,); res/dense/lvl broadcastable."""
    cu0 = cx.astype(jnp.uint32)
    cu1 = cy.astype(jnp.uint32)
    cu2 = cz.astype(jnp.uint32)
    r = res.astype(jnp.uint32)
    idx_dense = cu0 + r * (cu1 + r * cu2)
    idx_hash = (
        cu0 * jnp.uint32(_PRIMES[0])
        ^ cu1 * jnp.uint32(_PRIMES[1])
        ^ cu2 * jnp.uint32(_PRIMES[2])
    )
    idx = jnp.where(dense, idx_dense, idx_hash) & jnp.uint32(
        cfg.table_size - 1
    )
    return (idx + lvl.astype(jnp.uint32) * jnp.uint32(cfg.table_size)).astype(
        jnp.int32
    )


def _make_rows_fn(cfg: HashGridConfig, levels: list[int], addr: str):
    """Per-group closure mapping CELL coords + corner id -> table rows.

    addr='xor': tcnn-style hash (ops/hashgrid.py semantics).
    addr='slab': adjacent-corner slab layout (ops/hashgrid_slab.py) —
    the row is derived from the cell's slab base so corner pairing stays
    consistent with the pair backward."""
    if addr == "xor":
        scales, res, dense, lvl = _level_consts(cfg, levels)

        def rows_fn(cx, cy, cz, c):
            return _corner_rows(
                cx + (c & 1), cy + ((c >> 1) & 1), cz + ((c >> 2) & 1),
                res, dense, lvl, cfg,
            )

        return rows_fn

    from .hashgrid_slab import _qm, level_addrs

    addrs = [level_addrs(cfg)[lv] for lv in levels]
    T = cfg.table_size

    def rows_fn(cx, cy, cz, c):
        xr, yr, zc = c & 1, (c >> 1) & 1, (c >> 2) & 1
        rows = []
        for gi, a in enumerate(addrs):
            q, m = _qm(a, cx[gi], cy[gi], cz[gi], zc)
            inner = (q + jnp.uint32(yr)) * jnp.uint32(a.C) + m + jnp.uint32(
                xr
            )
            # boundary corner lands on T: clamp (grad dropped by the pair
            # backward's spare row — see hashgrid_slab._encode_group)
            rows.append(
                (
                    jnp.uint32(a.level * T)
                    + jnp.minimum(inner, jnp.uint32(T - 1))
                ).astype(jnp.int32)
            )
        return jnp.stack(rows)

    return rows_fn


def _trilinear_w(frac, dtype):
    """(..., 3) frac -> 8 corner weights stacked on a leading axis.

    Products are accumulated in f32 and cast once at the end, matching
    hashgrid.py's weight computation bit-for-bit."""
    f = frac.astype(jnp.float32)
    out = []
    for c in range(8):
        w = jnp.ones_like(f[..., 0])
        for d in range(3):
            b = (c >> d) & 1
            w = w * (f[..., d] if b else (1.0 - f[..., d]))
        out.append(w)
    return jnp.stack(out).astype(dtype)          # (8, ...)


def _gather_features(flat_rows, packed, t0, t1):
    """Gather the two feature planes for int32 stacked-table rows.

    packed: (L*T,) uint32 (bf16x2) or None; t0/t1: (L*T,) compute-dtype
    planes (used when packed is None)."""
    if packed is not None:
        g = jnp.take(packed, flat_rows)
        f0 = jax.lax.bitcast_convert_type(
            (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
        )
        f1 = jax.lax.bitcast_convert_type(
            (g >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
        )
        return f0, f1
    return jnp.take(t0, flat_rows), jnp.take(t1, flat_rows)


def _prep_blocks(x: jnp.ndarray, block: int):
    """(N, 3) -> (R, W, 3) with tail padding replicated from the last row
    (its voxels merge into the final run — near-zero extra gathers)."""
    N = x.shape[0]
    pad = (-N) % block
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad, 3))], axis=0)
    return x.reshape(-1, block, 3), N, pad


def _group_geometry(xb, scales, res):
    """Positions -> integer voxel coords + frac for one level group.

    xb: (R, W, 3); returns pos_i (G, R, W, 3) int32, frac (G, R, W, 3)."""
    pos = xb[None] * scales[..., None] + 0.5     # (G, R, W, 3)
    pos_i = jnp.floor(pos)
    frac = pos - pos_i
    return pos_i.astype(jnp.int32), frac


def _run_structure(pos_i):
    """Run-start flags and per-sample run ranks along W.

    pos_i: (G, R, W, 3) -> new (G, R, W) bool, rank (G, R, W) int32,
    nruns (G, R) int32."""
    same = jnp.all(pos_i[:, :, 1:, :] == pos_i[:, :, :-1, :], axis=-1)
    new = jnp.concatenate(
        [jnp.ones_like(same[:, :, :1]), ~same], axis=2
    )
    rank = jnp.cumsum(new.astype(jnp.int32), axis=2) - 1
    return new, rank, rank[:, :, -1] + 1


def _encode_group_dedup(
    xb, levels, U, cfg, packed, t0, t1, compute_dtype, block, addr="xor",
):
    """Encode one level group over (R, W) blocks; returns (G, R, W) f0/f1.

    Uses the dedup path unless any block overflows U runs, in which case
    the whole group falls back to the per-sample gather (lax.cond)."""
    G = len(levels)
    R, W = xb.shape[0], block
    scales, res, dense, lvl = _level_consts(cfg, levels)
    pos_i, frac = _group_geometry(xb, scales, res)
    wts = _trilinear_w(frac, compute_dtype)          # (8, G, R, W)
    new, rank, nruns = _run_structure(pos_i)
    rows_fn = _make_rows_fn(cfg, levels, addr)

    def corner_feats(cx, cy, cz):
        """(8, 2, ...) corner feature planes for coords (G, ..., 3 axes)."""
        f0s, f1s = [], []
        for c in range(8):
            rows = rows_fn(cx, cy, cz, c)
            f0, f1 = _gather_features(rows, packed, t0, t1)
            f0s.append(f0)
            f1s.append(f1)
        return jnp.stack(f0s), jnp.stack(f1s)        # (8, G, ...)

    def dedup_path(_):
        # run representatives: sort (new ? position : W) with the voxel
        # coords PACKED into one payload (grouped levels have res <= 285
        # by the cap rule, so 10 bits/axis suffice) — halves the sort's
        # payload traffic vs three separate coord arrays
        key = jnp.where(
            new, jax.lax.broadcasted_iota(jnp.int32, new.shape, 2), W
        )
        pc = (
            pos_i[..., 0] + (pos_i[..., 1] << 10) + (pos_i[..., 2] << 20)
        )
        _, up = jax.lax.sort(
            (key, pc), dimension=-1, num_keys=1, is_stable=False,
        )
        up = up[..., :U]                                     # (G, R, U)
        ux, uy, uz = up & 1023, (up >> 10) & 1023, up >> 20
        fu0, fu1 = corner_feats(ux, uy, uz)                  # (8, G, R, U)
        # broadcast runs -> samples: one-hot (G, R, W, U) matmul on the MXU
        onehot = (
            rank[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, rank.shape + (U,), 3)
        ).astype(compute_dtype)
        fu = jnp.concatenate([fu0, fu1]).astype(compute_dtype)  # (16,G,R,U)
        # HIGHEST: default TPU matmul precision truncates f32 operands to
        # bf16, breaking the documented bit-exactness of the one-hot
        # broadcast for float32 compute (no-op for bf16 operands).
        fs = jnp.einsum(
            "grwu,cgru->cgrw", onehot, fu,
            preferred_element_type=compute_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return fs[:8], fs[8:]

    def full_path(_):
        f0, f1 = corner_feats(
            pos_i[..., 0], pos_i[..., 1], pos_i[..., 2]
        )                                                    # (8, G, R, W)
        return f0.astype(compute_dtype), f1.astype(compute_dtype)

    if U >= W:
        f0c, f1c = full_path(None)
    else:
        overflow = jnp.any(nruns > U)
        f0c, f1c = jax.lax.cond(overflow, full_path, dedup_path, None)
    out0 = jnp.sum(wts * f0c, axis=0)                        # (G, R, W)
    out1 = jnp.sum(wts * f1c, axis=0)
    return out0, out1


def _flatten_tables(table, compute_dtype):
    """Stacked (L, T, 2) table -> gather-ready planes."""
    if compute_dtype == jnp.bfloat16:
        packed = jax.lax.bitcast_convert_type(
            table.astype(jnp.bfloat16), jnp.uint32
        ).reshape(-1)
        return packed, None, None
    t = table.astype(compute_dtype)
    return None, t[..., 0].reshape(-1), t[..., 1].reshape(-1)


def hashgrid_encode_dedup_fwd_impl(
    table, x, cfg: HashGridConfig, compute_dtype, block: int = BLOCK,
    caps: tuple[int, ...] | None = None, addr: str = "xor",
):
    """Non-differentiable forward. Returns (N, L*F) level-major features."""
    L, T, F = table.shape
    assert F == 2
    caps = caps or level_caps(cfg, block)
    groups, plain = _group_levels(caps, block)
    xb, N, _ = _prep_blocks(x, block)
    R = xb.shape[0]
    packed, t0, t1 = _flatten_tables(table, compute_dtype)

    out0 = [None] * L
    out1 = [None] * L
    for levels, U in groups:
        o0, o1 = _encode_group_dedup(
            xb, levels, U, cfg, packed, t0, t1, compute_dtype, block, addr
        )
        for gi, lvl in enumerate(levels):
            out0[lvl], out1[lvl] = o0[gi], o1[gi]
    if plain:
        o0, o1 = _encode_group_dedup(
            xb, plain, block, cfg, packed, t0, t1, compute_dtype, block,
            addr,
        )
        for gi, lvl in enumerate(plain):
            out0[lvl], out1[lvl] = o0[gi], o1[gi]

    p0 = jnp.stack(out0).reshape(L, -1)[:, :N]
    p1 = jnp.stack(out1).reshape(L, -1)[:, :N]
    return _cm_out(p0, p1)


def _group_grad(xb, levels, U, cfg, g0, g1, block, interpret):
    """Backward of one level group -> (G, T, 2) f32 table gradient.

    The lax.cond wraps the ENTIRE group backward (stream build + sort +
    windowed Pallas scatter) so the dedup branch sorts only the reduced
    8*R*U stream while the fallback branch sorts the full 8*R*W stream —
    branch outputs agree at the (G, T, 2) gradient.

    g0/g1: (G, R, W) f32 cotangents of the two feature planes."""
    G = len(levels)
    R, W = xb.shape[0], block
    T = cfg.table_size
    scales, res, dense, lvl0 = _level_consts(cfg, levels)
    lvl = jnp.zeros_like(lvl0)       # per-group tables: no level offset
    pos_i, frac = _group_geometry(xb, scales, res)
    wts = _trilinear_w(frac, jnp.float32)            # (8, G, R, W)
    new, rank, nruns = _run_structure(pos_i)
    wg = jnp.concatenate([wts * g0[None], wts * g1[None]])  # (16, G, R, W)

    def rows_for(cx, cy, cz):
        return jnp.stack([
            _corner_rows(
                cx + (c & 1), cy + ((c >> 1) & 1), cz + ((c >> 2) & 1),
                res, dense, lvl, cfg,
            )
            for c in range(8)
        ])                                            # (8, G, ...)

    def scatter(rows, v0, v1, n):
        rs = jnp.transpose(rows, (1, 0, 2, 3)).reshape(G, n)
        v0 = jnp.transpose(v0, (1, 0, 2, 3)).reshape(G, n)
        v1 = jnp.transpose(v1, (1, 0, 2, 3)).reshape(G, n)
        sk, s0, s1 = jax.lax.sort(
            (rs, v0, v1), dimension=-1, num_keys=1, is_stable=False
        )
        return sorted_table_grad_window(sk, s0, s1, T, interpret=interpret)

    def dedup_path(_):
        key = jnp.where(
            new, jax.lax.broadcasted_iota(jnp.int32, new.shape, 2), W
        )
        pc = (
            pos_i[..., 0] + (pos_i[..., 1] << 10) + (pos_i[..., 2] << 20)
        )
        _, up = jax.lax.sort(
            (key, pc), dimension=-1, num_keys=1, is_stable=False,
        )
        up = up[..., :U]
        ux, uy, uz = up & 1023, (up >> 10) & 1023, up >> 20
        rows = rows_for(ux, uy, uz)                   # (8, G, R, U)
        onehot = (
            rank[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, rank.shape + (U,), 3)
        ).astype(jnp.float32)
        # transposed broadcast: sample grads -> run grads (MXU)
        du = jnp.einsum(
            "grwu,cgrw->cgru", onehot, wg,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,      # f32-exact reduction
        )                                             # (16, G, R, U)
        return scatter(rows, du[:8], du[8:], 8 * R * U)

    def full_path(_):
        rows = rows_for(pos_i[..., 0], pos_i[..., 1], pos_i[..., 2])
        return scatter(rows, wg[:8], wg[8:], 8 * R * W)

    if U >= W:
        return full_path(None)
    overflow = jnp.any(nruns > U)
    return jax.lax.cond(overflow, full_path, dedup_path, None)


def hashgrid_table_grad_dedup(
    x, g, cfg: HashGridConfig, block: int = BLOCK,
    caps: tuple[int, ...] | None = None, interpret: bool = False,
):
    """dL/dtable via run-dedup reduction + sort + windowed Pallas scatter.

    x: (N, 3); g: (N, L*F) f32 cotangent. Returns (L, T, 2) f32."""
    L, T = cfg.n_levels, cfg.table_size
    caps = caps or level_caps(cfg, block)
    groups, plain = _group_levels(caps, block)
    xb, N, pad = _prep_blocks(x, block)
    R = xb.shape[0]
    # (N, L*2) -> per-level per-feature planes (L, R, W), pad with zeros
    gt = jnp.transpose(g).reshape(L, 2, N).astype(jnp.float32)
    if pad:
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, pad)))
    g0 = gt[:, 0].reshape(L, R, block)
    g1 = gt[:, 1].reshape(L, R, block)

    out = [None] * L
    for levels, U in groups + ([(plain, block)] if plain else []):
        sel = np.asarray(levels)
        grad_g = _group_grad(
            xb, levels, U, cfg, g0[sel], g1[sel], block, interpret
        )                                             # (G, T, 2)
        for gi, lvl in enumerate(levels):
            out[lvl] = grad_g[gi]
    return jnp.stack(out)


@functools.lru_cache(maxsize=None)
def _make_fused_dedup(cfg: HashGridConfig, compute_dtype_name: str,
                      block: int, interpret: bool, grad_impl: str):
    compute_dtype = jnp.dtype(compute_dtype_name)
    caps = level_caps(cfg, block)

    @jax.custom_vjp
    def fused(table, x):
        return hashgrid_encode_dedup_fwd_impl(
            table, x, cfg, compute_dtype, block, caps
        )

    def fwd(table, x):
        return fused(table, x), (x, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        x, dtype_token = res
        if grad_impl == "dedup":
            dtable = hashgrid_table_grad_dedup(
                x, g.astype(jnp.float32), cfg, block, caps,
                interpret=interpret,
            )
        else:
            # measured on v5e: ONE full-stream sort + ONE windowed Pallas
            # scatter beats the per-group reduced-stream scatters (the
            # kernel cost is window-walk-overhead-bound, not stream-bound;
            # examples/bench_dedup.py) — so the default backward ignores
            # the dedup structure and reuses hashgrid_window's path.
            from .hashgrid import hashgrid_indices_cm
            from .hashgrid_window import hashgrid_table_grad_window

            idx, w = hashgrid_indices_cm(x, cfg)
            dtable = hashgrid_table_grad_window(
                idx, w, g.astype(jnp.float32), cfg, interpret=interpret,
                pack_f16=(compute_dtype == jnp.bfloat16),
            )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_dedup(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
    block: int = BLOCK,
    interpret: bool = False,
    grad_impl: str = "window",
) -> jnp.ndarray:
    """Run-dedup hash-grid encode forward + windowed-scatter backward.

    Numerically identical to ops.hashgrid.hashgrid_encode(...) at the same
    compute dtype (dedup merges only exactly-equal voxel coords; overflow
    falls back). grad_impl: 'window' (default; full-stream sort + scatter)
    or 'dedup' (per-group reduced-stream — slower on v5e, kept for
    comparison). No gradient to x (matching the reference, where
    RayMarcher's position gradients are never consumed,
    custom_functions.py:102-112)."""
    return _make_fused_dedup(
        cfg, jnp.dtype(compute_dtype).name, block, interpret, grad_impl
    )(table, x)
