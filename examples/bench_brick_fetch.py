"""Microbenchmark: brick-row fetch + multi-hot extraction vs scalar gathers.

Round-4 design probe (VERDICT #1): one fine hash level at bench shapes
(N = 98304 samples, T = 2^19 packed u32 = (4096, 128) rows).

  scalar8   — current slab/tcnn forward: 8 scalar u32 gathers per sample
  brick2    — proposed brick layout: 2 row gathers (z, z+1) per sample +
              dense VPU multi-hot corner extraction (4 xy-corners live in
              known lanes of the fetched 128-lane row; weights folded into
              the multi-hot so no dynamic lane indexing happens)

Timing uses the honest axon sync (scalar reduce inside jit + device_get).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R, LANES = 4096, 128
N = 98304


def timeit(f, *a, iters=30):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / iters


def unpack(g):
    lo = jax.lax.bitcast_convert_type(
        (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (g >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    )
    return lo, hi


@jax.jit
def scalar8(tbl_flat, idx8, w8):
    # idx8: (8, N) flat entries; w8: (8, N) f32 corner weights
    g = jnp.take(tbl_flat, idx8.reshape(-1)).reshape(8, N)
    lo, hi = unpack(g)
    w = w8.astype(jnp.bfloat16)
    f0 = jnp.sum(w * lo, axis=0)
    f1 = jnp.sum(w * hi, axis=0)
    return jnp.sum(f0.astype(jnp.float32)) + jnp.sum(f1.astype(jnp.float32))


@jax.jit
def brick2(tbl, rows2, lane0, w4x2):
    # rows2: (2, N) row ids; lane0: (N,) base lane (lx + 11*ly);
    # w4x2: (2, 4, N) f32 weights of the 4 xy-corners per z-row
    out0 = jnp.zeros((N,), jnp.float32)
    out1 = jnp.zeros((N,), jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 1)
    for zr in range(2):
        g = jnp.take(tbl, rows2[zr], axis=0)          # (N, 128) u32
        lo, hi = unpack(g)
        # weighted multi-hot over the 4 corner lanes (l0, l0+1, +11, +12)
        W = jnp.zeros((N, LANES), jnp.bfloat16)
        for ci, off in enumerate((0, 1, 11, 12)):
            W = W + jnp.where(
                lanes == (lane0 + off)[:, None],
                w4x2[zr, ci][:, None].astype(jnp.bfloat16),
                jnp.bfloat16(0),
            )
        out0 = out0 + jnp.sum((W * lo).astype(jnp.float32), axis=1)
        out1 = out1 + jnp.sum((W * hi).astype(jnp.float32), axis=1)
    return jnp.sum(out0) + jnp.sum(out1)


def main():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**32, (R, LANES), dtype=np.uint32))
    idx8 = jnp.asarray(
        rng.integers(0, R * LANES, (8, N), dtype=np.int64).astype(np.int32)
    )
    w8 = jnp.asarray(rng.random((8, N), np.float32))
    rows2 = jnp.asarray(
        rng.integers(0, R, (2, N), dtype=np.int64).astype(np.int32)
    )
    lane0 = jnp.asarray(
        rng.integers(0, 116, (N,), dtype=np.int64).astype(np.int32)
    )
    w4x2 = jnp.asarray(rng.random((2, 4, N), np.float32))

    t = timeit(scalar8, tbl.reshape(-1), idx8, w8)
    print(f"scalar8 : {t * 1e3:7.3f} ms/level  "
          f"({8 * N / t / 1e6:5.0f} M issues/s)")
    t = timeit(brick2, tbl, rows2, lane0, w4x2)
    print(f"brick2  : {t * 1e3:7.3f} ms/level  "
          f"({2 * N / t / 1e6:5.0f} M row-issues/s)")


if __name__ == "__main__":
    main()
