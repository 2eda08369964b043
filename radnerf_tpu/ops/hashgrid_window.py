"""Windowed Pallas scatter for the hash-grid table gradient.

The table gradient is 25-100M random 4-byte read-modify-writes per training
step — the single hottest op in the framework (tinycudann does it with
hardware atomicAdd on GPU). TPU has no scatter hardware and every XLA/naive
path is issue-rate bound (measured on v5e, examples/bench_scatter.py):

    XLA scatter-add (unsorted)        15 M upd/s
    Pallas serial row-RMW             33 M upd/s   (round-1 kernel)
    XLA scatter-add (sorted hint)    101 M upd/s   (scalar values only)
    lax.sort (key + 2 payloads)      424 M upd/s

This kernel breaks the issue-rate wall by combining the sorted stream with
*dense windowed accumulation*: sort is the TPU's only fast random-access
engine, and once the update stream is row-sorted, any tile of TILE
consecutive updates targets a narrow band of table rows. Each tile is then
processed with full-width VPU ops:

  1. two-hot value matrix  M[u, j] = (j>>1 == sk[u]-base) * (j&1 ? s1 : s0)
     built with vector compares against a lane iota — (TILE, 2*W) f32;
  2. column reduction  contrib[j] = sum_u M[u, j]  — a dense VPU reduce;
  3. one dynamic-sublane add of the (2*W/128, 128) window into the level's
     f32 accumulator slab (flat layout: feature pos = 2*row + f).

No per-update serial work remains; amortized cost is a few cycles/update.
Tiles spanning more than W rows (sparse regions) loop over as many windows
as needed — exactness does not depend on the data distribution.

Layout notes: the (T, 2) gradient lives as a (T*2/128, 128) slab because a
2-wide trailing dim would waste 126/128 VMEM lanes; windows are aligned to
64 table rows so they start on a slab sublane boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_encode_packed,
    hashgrid_indices_cm,
)

LANES = 128
W_ROWS = 64             # table rows per window == one slab sublane
WIN_FLAT = 2 * W_ROWS   # flat feature positions per window (= LANES)
TILE_SUB = 8            # update tile is a (TILE_SUB, LANES) block
TILE = TILE_SUB * LANES  # 1024 updates per tile


def _window_scatter_kernel(sk_ref, s0_ref, s1_ref, out_ref):
    """Accumulate one (level, update-tile) block of sorted updates.

    sk_ref:      (1, 1, TILE_SUB, LANES) int32 — sorted rows of this tile
                 (row-major flattening preserves sorted order; only the
                 min/max — static first/last elements of each sub-row —
                 are read as scalars, the set is consumed by vector ops).
    s0/s1_ref:   (1, 1, TILE_SUB, LANES) f32 — feature-0/1 update values.
    out_ref:     (1, slab_rows, LANES) f32 — the level's gradient slab,
                 VMEM-resident across update tiles (index map ignores p).
                 Flat feature position of (row r, feature f) = 2r + f.

    The tile is processed in TILE_SUB sub-rows of LANES sorted updates:
    each sub-row only walks the windows IT spans, and its per-window
    two-hot build is (LANES, WIN_FLAT) = 16k lanes instead of the whole
    tile's 131k — a ~5x cut in VPU work for streams that touch many table
    rows (the fine hashed levels), where the window count is bound by the
    touched-row range rather than the update count.
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    j = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_FLAT), 1)
    j_row = j >> 1                       # (1, WIN_FLAT)
    j_odd = (j & 1) == 1

    for s in range(TILE_SUB):
        sk_s = sk_ref[0, 0, s, :][:, None]      # (LANES, 1)
        val = jnp.where(
            j_odd, s1_ref[0, 0, s, :][:, None], s0_ref[0, 0, s, :][:, None]
        )                                        # (LANES, WIN_FLAT)
        r_lo = sk_ref[0, 0, s, 0]
        r_hi = sk_ref[0, 0, s, LANES - 1]
        base0 = (r_lo >> 6) << 6         # align to slab sublane (64 rows)
        n_win = ((r_hi - base0) >> 6) + 1

        def body(w, _, sk_s=sk_s, val=val, base0=base0):
            base = base0 + w * W_ROWS
            m = jnp.where(sk_s - base == j_row, val, 0.0)
            contrib = jnp.sum(m, axis=0).reshape(1, WIN_FLAT)
            sub = base >> 6              # slab sublane = 2*base/LANES
            out_ref[0, pl.ds(sub, 1), :] = (
                out_ref[0, pl.ds(sub, 1), :] + contrib
            )
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)


def sorted_table_grad_window(
    sk: jnp.ndarray,
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    table_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, T, 2) f32 gradient from a row-sorted update stream.

    Args:
        sk: (L, n) int32 sorted (non-decreasing per level) table rows.
        s0, s1: (L, n) f32 update values for features 0 / 1.
    """
    L, n = sk.shape
    T = table_size
    assert T % W_ROWS == 0
    pad = (-n) % TILE
    if pad:
        # pad with zero-valued updates aimed at each level's LAST real key:
        # keys stay sorted, the contribution is exactly 0, and the final
        # tile's window walk stays within the touched row range (padding
        # at T-1 would make it scan to the table end)
        sk = jnp.concatenate(
            [sk, jnp.broadcast_to(sk[:, -1:], (L, pad))], axis=1
        )
        s0 = jnp.pad(s0, ((0, 0), (0, pad)))
        s1 = jnp.pad(s1, ((0, 0), (0, pad)))
    n_pad = n + pad
    n_tiles = n_pad // TILE
    # one spare sublane: the last window's 64-aligned base can start as
    # high as row T-64 and its single-sublane add lands exactly on the
    # final slab row — the spare only guards the degenerate T < TILE case
    slab_rows = T * 2 // LANES + 1
    shape4 = (L, n_tiles, TILE_SUB, LANES)

    slab = pl.pallas_call(
        _window_scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((L, slab_rows, LANES), jnp.float32),
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_SUB, LANES), lambda l, p: (l, p, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec(
            (1, slab_rows, LANES), lambda l, p: (l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sk.reshape(shape4),
        s0.reshape(shape4),
        s1.reshape(shape4),
    )
    # slab flat position 2*r + f -> (T, 2); drop the spare padding sublane
    return slab[:, : T * 2 // LANES, :].reshape(L, T, 2)


def hashgrid_table_grad_window(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    g: jnp.ndarray,
    cfg: HashGridConfig,
    interpret: bool = False,
    pack_f16: bool = True,
) -> jnp.ndarray:
    """dL/dtable: sort the update stream, then windowed dense accumulation.

    Args:
        idx: (L, 8, N) int32 corner rows (corner-major, full-width);
        w: (L, 8, N) weights; g: (N, L*F) output cotangent (level-major).
        pack_f16: carry the two per-update values as f16x2 in ONE u32 sort
            payload instead of two f32 payloads — ~25% faster sort. The
            per-update rounding matches the reference's fp16 gradient
            accumulation (tcnn accumulates hash-table grads with half2
            atomics under AMP + PL dynamic loss scaling, train.py:318); a
            per-level power-of-two scale keeps small updates above f16's
            subnormal floor, and the window kernel still ACCUMULATES in
            f32. Set False for f32-exact gradients (tests).
    """
    L, _, N = idx.shape
    T, F = cfg.table_size, cfg.n_features
    assert F == 2
    n = N * 8
    # (N, L*2) -> per-feature (L, N) planes, no narrow intermediates
    gt = jnp.transpose(g).reshape(L, 2, N).astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    v0 = (w32 * gt[:, 0, None, :]).reshape(L, n)
    v1 = (w32 * gt[:, 1, None, :]).reshape(L, n)
    if pack_f16:
        # Per-level power-of-two loss scale: the reference trains under PL
        # precision=16 WITH dynamic loss scaling (~2^16) before tcnn's half
        # atomics; raw w*g values below f16's subnormal floor (~6e-8) would
        # otherwise round to zero here. Scaling each level's stream so its
        # amax sits near 2^14 keeps ~38 bits of dynamic range below the
        # peak; dividing the f32-accumulated slab by the exact power of two
        # afterwards is lossless.
        amax = jnp.max(
            jnp.maximum(jnp.abs(v0), jnp.abs(v1)), axis=1, keepdims=True
        )
        _, e = jnp.frexp(amax)                      # amax = m * 2^e
        scale = jnp.where(amax > 0.0, jnp.exp2((14 - e).astype(jnp.float32)),
                          1.0)                      # (L, 1)
        h0 = jax.lax.bitcast_convert_type(
            (v0 * scale).astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32)
        h1 = jax.lax.bitcast_convert_type(
            (v1 * scale).astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32)
        packed = h0 | (h1 << jnp.uint32(16))
        sk, sp = jax.lax.sort(
            (idx.reshape(L, n), packed), dimension=-1, num_keys=1,
            is_stable=False,
        )
        s0 = jax.lax.bitcast_convert_type(
            (sp & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        s1 = jax.lax.bitcast_convert_type(
            (sp >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        grad = sorted_table_grad_window(sk, s0, s1, T, interpret=interpret)
        return grad * (1.0 / scale)[:, :, None]
    else:
        sk, s0, s1 = jax.lax.sort(
            (idx.reshape(L, n), v0, v1), dimension=-1, num_keys=1,
            is_stable=False,
        )
        return sorted_table_grad_window(sk, s0, s1, T, interpret=interpret)


W2_ROWS = 128            # pair-kernel window: 2 slab sublanes per step
WIN2_FLAT = 2 * W2_ROWS


def _window_scatter_pair_kernel(
    sk_ref, s0e_ref, s0o_ref, s1e_ref, s1o_ref, out_ref
):
    """Pair variant: each sorted entry contributes to TWO adjacent table
    rows (k, k+1) — the x-corner pair of the slab layout
    (ops/hashgrid_slab.py) — with independent (feature0, feature1) values
    for each. Halves the sorted-stream element count at the same total
    payload words. Windows span 128 table rows (2 slab sublanes): the
    serial window walk is the kernel's bound (profiler: 27 ms at 6.3M
    entries with 64-row windows), so wider windows trade vectorized
    compare width for half the iterations."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # flat feature position within a 128-lane sublane: row = j >> 1
    j = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    j_row = j >> 1
    j_odd = (j & 1) == 1

    for s in range(TILE_SUB):
        sk_s = sk_ref[0, 0, s, :][:, None]      # (LANES, 1)
        ve = jnp.where(
            j_odd, s1e_ref[0, 0, s, :][:, None], s0e_ref[0, 0, s, :][:, None]
        )
        vo = jnp.where(
            j_odd, s1o_ref[0, 0, s, :][:, None], s0o_ref[0, 0, s, :][:, None]
        )
        r_lo = sk_ref[0, 0, s, 0]
        r_hi = sk_ref[0, 0, s, LANES - 1] + 1   # +1: the x-odd row
        base0 = (r_lo >> 7) << 7
        n_win = ((r_hi - base0) >> 7) + 1

        def body(w, _, sk_s=sk_s, ve=ve, vo=vo, base0=base0):
            base = base0 + w * W2_ROWS
            # two 64-row half-windows -> one (2, 128) two-sublane add
            halves = []
            for h in (0, 1):
                d = sk_s - (base + 64 * h)
                m = jnp.where(d == j_row, ve, 0.0) + jnp.where(
                    d + 1 == j_row, vo, 0.0
                )
                halves.append(jnp.sum(m, axis=0).reshape(1, LANES))
            contrib = jnp.concatenate(halves, axis=0)
            sub = base >> 6                      # 128-row base -> even sub
            out_ref[0, pl.ds(sub, 2), :] = (
                out_ref[0, pl.ds(sub, 2), :] + contrib
            )
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)


def sorted_table_grad_window_pair(
    sk: jnp.ndarray,
    s0e: jnp.ndarray,
    s0o: jnp.ndarray,
    s1e: jnp.ndarray,
    s1o: jnp.ndarray,
    table_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, T, 2) f32 gradient from a row-sorted PAIR update stream.

    Entry i adds (s0e, s1e) to table row sk[i] and (s0o, s1o) to row
    sk[i] + 1 (features 0/1 respectively). Rows sk[i] + 1 == T spill into
    the spare slab sublanes and are dropped (the documented 2e-6 boundary
    case of the slab layout)."""
    L, n = sk.shape
    T = table_size
    assert T % W2_ROWS == 0
    pad = (-n) % TILE
    if pad:
        sk = jnp.concatenate(
            [sk, jnp.broadcast_to(sk[:, -1:], (L, pad))], axis=1
        )
        s0e, s0o, s1e, s1o = (
            jnp.pad(v, ((0, 0), (0, pad))) for v in (s0e, s0o, s1e, s1o)
        )
    n_pad = n + pad
    n_tiles = n_pad // TILE
    # +2 spare sublanes: the final 128-row window can start at T and its
    # two-sublane write must stay in bounds
    slab_rows = T * 2 // LANES + 2
    shape4 = (L, n_tiles, TILE_SUB, LANES)

    slab = pl.pallas_call(
        _window_scatter_pair_kernel,
        out_shape=jax.ShapeDtypeStruct((L, slab_rows, LANES), jnp.float32),
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_SUB, LANES), lambda l, p: (l, p, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
        out_specs=pl.BlockSpec(
            (1, slab_rows, LANES), lambda l, p: (l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sk.reshape(shape4),
        s0e.reshape(shape4),
        s0o.reshape(shape4),
        s1e.reshape(shape4),
        s1o.reshape(shape4),
    )
    return slab[:, : T * 2 // LANES, :].reshape(L, T, 2)


def hashgrid_table_grad_window_pair(
    key: jnp.ndarray,
    v0e: jnp.ndarray,
    v0o: jnp.ndarray,
    v1e: jnp.ndarray,
    v1o: jnp.ndarray,
    table_size: int,
    interpret: bool = False,
    pack_f16: bool = True,
) -> jnp.ndarray:
    """Sort an (L, n) pair-update stream and accumulate it.

    pack_f16 packs each feature's (x-even, x-odd) values into one u32 sort
    payload (f16x2, per-level power-of-two loss scale — see
    hashgrid_table_grad_window) so the sort carries 1 key + 2 payloads for
    4 values; False sorts 4 f32 payloads (exact, for tests)."""
    L, n = key.shape
    if pack_f16:
        amax = jnp.max(
            jnp.maximum(
                jnp.maximum(jnp.abs(v0e), jnp.abs(v0o)),
                jnp.maximum(jnp.abs(v1e), jnp.abs(v1o)),
            ),
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

        sk, p0, p1 = jax.lax.sort(
            (key, pack(v0e, v0o), pack(v1e, v1o)),
            dimension=-1, num_keys=1, is_stable=False,
        )

        def unpack(p):
            lo = jax.lax.bitcast_convert_type(
                (p & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16
            ).astype(jnp.float32)
            hi = jax.lax.bitcast_convert_type(
                (p >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16
            ).astype(jnp.float32)
            return lo, hi

        s0e, s0o = unpack(p0)
        s1e, s1o = unpack(p1)
        grad = sorted_table_grad_window_pair(
            sk, s0e, s0o, s1e, s1o, table_size, interpret=interpret
        )
        return grad * (1.0 / scale)[:, :, None]
    sk, s0e, s0o, s1e, s1o = jax.lax.sort(
        (key, v0e, v0o, v1e, v1o), dimension=-1, num_keys=1, is_stable=False
    )
    return sorted_table_grad_window_pair(
        sk, s0e, s0o, s1e, s1o, table_size, interpret=interpret
    )


@functools.lru_cache(maxsize=None)
def _make_fused_window(cfg: HashGridConfig, compute_dtype_name: str,
                       interpret: bool):
    compute_dtype = jnp.dtype(compute_dtype_name)

    if compute_dtype == jnp.bfloat16:
        # packed-u32 gather: one issue per (level, point, corner)
        def primal(table, x):
            return hashgrid_encode_packed(table, x, cfg)
    else:
        def primal(table, x):
            return hashgrid_encode(table, x, cfg, compute_dtype)

    @jax.custom_vjp
    def fused(table, x):
        return primal(table, x)

    def fwd(table, x):
        return primal(table, x), (x, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        x, dtype_token = res
        idx, w = hashgrid_indices_cm(x, cfg)  # rematerialized
        dtable = hashgrid_table_grad_window(
            idx, w, g.astype(jnp.float32), cfg, interpret=interpret,
            # f16-packed sort payloads only in reduced-precision training
            # (matches the reference's AMP grad accumulation); f32 compute
            # keeps f32-exact gradients
            pack_f16=(compute_dtype == jnp.bfloat16),
        )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_window(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """hashgrid_encode with the sorted-windowed-scatter backward.

    Forward: XLA gather (same as ops.hashgrid). Backward: lax.sort +
    `sorted_table_grad_window`. No gradient to x (the reference's position
    gradients are never consumed, custom_functions.py:102-112)."""
    return _make_fused_window(cfg, jnp.dtype(compute_dtype).name, interpret)(
        table, x
    )
