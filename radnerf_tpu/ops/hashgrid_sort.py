"""Sort-based hash-grid table gradient: scatter re-expressed as gather.

The training bottleneck of every field in the reference is the hash-table
gradient (tinycudann does it with fp16 atomicAdd on GPU,
`networks.py:42-55`). TPUs have no scatter hardware: XLA's scatter-add
serializes (~12.5M updates/s) and even a hand-written Pallas row-RMW loop
tops out near ~30 cycles/update (see ops/hashgrid_pallas.py). This module
removes the scatter entirely:

  1. sort the (row, w*g) update stream by table row   (lax.sort, vectorized)
  2. scatter-add the sorted stream with indices_are_sorted=True

Measured on v5e (examples/bench_scatter.py, 25.2M updates, T=2^19, L=16):
an unsorted XLA scatter-add runs at 15M upd/s; the same scatter on a sorted
stream with the sorted hint runs at ~100M upd/s (XLA vectorizes runs), and
the 3-operand lax.sort itself is only ~60 ms (420M upd/s) — sorting is the
TPU's vectorized random-access engine. A binary-search formulation
(segment_totals_sorted below, kept for tests) loses: batched searchsorted
gathers serialize at ~12M q/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_encode_packed,
    hashgrid_indices_cm,
)


def segment_totals_sorted(sk: jnp.ndarray, vals: tuple, n_rows: int):
    """Per-row sums of a row-sorted update stream, with zero scatters.

    Args:
        sk: (..., n) int32 sorted table rows.
        vals: tuple of (..., n) f32 update values aligned with sk.
        n_rows: number of table rows T.
    Returns:
        tuple of (..., T) f32 per-row totals.
    """
    q = jnp.arange(n_rows, dtype=sk.dtype)
    # right boundary of each row's run; left(t) == right(t-1), right(-1)=0
    hi = jax.vmap(lambda a: jnp.searchsorted(a, q, side="right"))(
        sk.reshape(-1, sk.shape[-1])
    ).reshape(sk.shape[:-1] + (n_rows,))
    lo = jnp.concatenate(
        [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1
    )
    outs = []
    for v in vals:
        cp = jnp.concatenate(
            [jnp.zeros_like(v[..., :1]), jnp.cumsum(v, axis=-1)], axis=-1
        )
        outs.append(
            jnp.take_along_axis(cp, hi, -1) - jnp.take_along_axis(cp, lo, -1)
        )
    return tuple(outs)


def hashgrid_table_grad_sort(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    g: jnp.ndarray,
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """dL/dtable via sort + prefix-sum + binary search (no scatter).

    Args:
        idx: (L, 8, N) int32 corner rows per level (corner-major).
        w:   (L, 8, N) trilinear weights.
        g:   (N, L*F) cotangent of the encoding output (level-major).
    Returns:
        (L, T, F) f32 table gradient.
    """
    L, _, N = idx.shape
    T, F = cfg.table_size, cfg.n_features
    assert F == 2, "specialized for the reference's F=2"
    n = N * 8

    gt = jnp.transpose(g).reshape(L, F, N).astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    v0 = (w32 * gt[:, 0, None, :]).reshape(L, n)
    v1 = (w32 * gt[:, 1, None, :]).reshape(L, n)
    keys = idx.reshape(L, n)

    sk, s0, s1 = jax.lax.sort(
        (keys, v0, v1), dimension=-1, num_keys=1, is_stable=False
    )
    out = jnp.zeros((L, T, F), jnp.float32)
    lidx = jnp.arange(L, dtype=sk.dtype)[:, None]
    # (level, row) index pairs are lexicographically sorted: level-major,
    # rows sorted within each level -> XLA's fast sorted-scatter path.
    return out.at[lidx, sk].add(
        jnp.stack([s0, s1], axis=-1), indices_are_sorted=True
    )


@functools.lru_cache(maxsize=None)
def _make_fused_sort(cfg: HashGridConfig, compute_dtype_name: str):
    compute_dtype = jnp.dtype(compute_dtype_name)

    if compute_dtype == jnp.bfloat16:
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
        dtable = hashgrid_table_grad_sort(
            idx, w, g.astype(jnp.float32), cfg
        )
        return dtable.astype(dtype_token.dtype), jnp.zeros_like(x)

    fused.defvjp(fwd, bwd)
    return fused


def hashgrid_encode_sort(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """hashgrid_encode with the sort-based table-gradient backward.

    Forward identical to ops.hashgrid.hashgrid_encode (XLA gather). No
    gradient flows to x (matching the reference's unused position-gradient
    path, custom_functions.py:102-112)."""
    return _make_fused_sort(cfg, jnp.dtype(compute_dtype).name)(table, x)
