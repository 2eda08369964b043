"""Microbenchmark: in-kernel VMEM gather rates on TPU.

Round-4 question (VERDICT #1): the encode forward sits on XLA's ~130M
scalar-gather-issues/s wall (docs/PERF_NOTES.md). A fine hash level's
packed table is 2 MB (T=2^19 u32) — it FITS IN VMEM. If Mosaic can gather
from a VMEM-staged table materially faster than the XLA HBM emitter, the
fine-level forward moves off the wall.

Formulations measured (all gather E elements from a (R, 128) u32 table):
  xla_scalar   — baseline: jnp.take on the flat table (the current path)
  tal_sublane  — in-kernel jnp.take_along_axis(tbl, rows, axis=0):
                 per-lane sublane gather, lane index fixed (NOT a general
                 gather; upper-bounds the dynamic-gather primitive rate)
  rowgather_onehot — general gather: per tile of 128 indices, sublane-
                 gather the 128 rows then one-hot-extract the lane on the
                 VPU/MXU (row r = flat >> 7, lane c = flat & 127)

Usage: python examples/bench_vmem_gather.py [--elems 4194304]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096          # table rows (R * 128 * 4 B = 2 MB — one fine level)
LANES = 128


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- baseline
@jax.jit
def xla_scalar(tbl_flat, idx_flat):
    return jnp.take(tbl_flat, idx_flat)


# ------------------------------------------------- in-kernel sublane gather
def _tal_kernel(tbl_ref, rows_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], rows_ref[:], axis=0)


@jax.jit
def tal_sublane(tbl, rows):
    return pl.pallas_call(
        _tal_kernel,
        out_shape=jax.ShapeDtypeStruct(rows.shape, tbl.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, rows)


# --------------------------------------- general gather: rows then one-hot
def _rowgather_kernel(tbl_ref, row_ref, lane_ref, out_ref):
    # row/lane: (B, 128) int32; each row of 128 indices is one tile.
    B = row_ref.shape[0]

    def body(i, _):
        r = row_ref[i, :]                       # (128,) rows for this tile
        c = lane_ref[i, :]
        g = jnp.take_along_axis(
            tbl_ref[:], jnp.broadcast_to(r[None, :], (LANES, LANES)).T,
            axis=0,
        )                                        # g[k, j] = tbl[r_k, j]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            == c[:, None]
        )
        out_ref[i, :] = jnp.sum(
            jnp.where(onehot, g, jnp.uint32(0)), axis=1
        )
        return 0

    jax.lax.fori_loop(0, B, body, 0)


@jax.jit
def rowgather_onehot(tbl, row, lane):
    return pl.pallas_call(
        _rowgather_kernel,
        out_shape=jax.ShapeDtypeStruct(row.shape, tbl.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, row, lane)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elems", type=int, default=4 * 1024 * 1024)
    args = ap.parse_args()
    E = args.elems
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, (R, LANES), dtype=np.uint32))
    flat = jnp.asarray(
        rng.integers(0, R * LANES, (E,), dtype=np.int64).astype(np.int32)
    )
    rows2d = jnp.asarray(
        rng.integers(0, R, (E // LANES, LANES), dtype=np.int64).astype(
            np.int32
        )
    )
    row = (flat >> 7).reshape(E // LANES, LANES)
    lane = (flat & 127).reshape(E // LANES, LANES)

    print(f"# table {R}x{LANES} u32 ({R * LANES * 4 / 2**20:.1f} MB), "
          f"E = {E / 1e6:.1f}M")

    t = timeit(xla_scalar, tbl.reshape(-1), flat)
    print(f"xla_scalar        : {t * 1e3:7.2f} ms  {E / t / 1e6:7.0f} M/s")

    try:
        t = timeit(tal_sublane, tbl, rows2d)
        print(f"tal_sublane       : {t * 1e3:7.2f} ms  "
              f"{E / t / 1e6:7.0f} M/s")
    except Exception as e:
        print(f"tal_sublane       : FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})")

    try:
        t = timeit(rowgather_onehot, tbl, row, lane)
        print(f"rowgather_onehot  : {t * 1e3:7.2f} ms  "
              f"{E / t / 1e6:7.0f} M/s")
    except Exception as e:
        print(f"rowgather_onehot  : FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
