"""Microbench: XLA gather ISSUE RATE vs gathered-slice shape on the TPU.

Decides the round-3 hash-grid table layout. Question: TPU gathers are
issue-rate bound (~100M issues/s on v5e regardless of row width —
docs/PERF_NOTES.md); if a single issue can fetch a SLICE covering several
trilinear corners (row-pair via an additive-x hash, 2x2 slab via an
additive-x + strided-y layout, 2x2x2 cube for dense levels), the per-point
issue count drops 2-8x. The catch is the OUTPUT LAYOUT: a gather result
with a small trailing dim is tile-padded up to 64x in HBM (the round-1 OOM).
`jax.lax.gather` lets us place the slice dims AWAY from the minor-most
output position (offset_dims), keeping the 128-wide index batch minor.

Measures, at hash-table scale (T=2^19 u32 rows, M issues):
  scalar          one u32 per issue                  (round-2 packed path)
  pair-row        (2,)  u32 slice, output (A,2,128)
  slab22          (2,2) u32 slice from (T/128, 130) operand, out (A,2,2,128)
  cube222         (2,2,2) u32 slice from a dense (64,64,64), out (A,2,2,2,128)
plus the same with a multiply+reduce consumer (checks fusion/materialize),
reporting ms, M issues/s, and effective gathered u32/s.

Usage: python examples/bench_gather_shapes.py [M_issues]
"""

import sys
import time

import jax
import jax.numpy as jnp

from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=10):
    for _ in range(warmup):
        out = f(*a)
    _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
        _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / iters


def main():
    enable_compilation_cache()
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304  # 4M issues
    T = 1 << 19
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(
        key, (T,), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    A = M // 128
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (A, 128), 0, T - 200, dtype=jnp.int32
    )

    def report(name, dt, n_issues, vals_per_issue):
        print(
            f"{name:28s} {dt*1e3:8.2f} ms  {n_issues/dt/1e6:8.1f} M iss/s"
            f"  {n_issues*vals_per_issue/dt/1e6:9.1f} M u32/s",
            flush=True,
        )

    # --- scalar gather (baseline): one u32 per issue --------------------
    @jax.jit
    def g_scalar(t, ix):
        v = jnp.take(t, ix.reshape(-1))
        return jnp.sum(v.astype(jnp.float32))

    report("scalar", timeit(g_scalar, table, idx), M, 1)

    # --- pair-row gather: slice (2,), slice dim NOT minor ---------------
    # operand (T, 1) viewed for a (2, 1) slice; offset dims placed at
    # output positions 1 (size 2); index batch (A, 128) stays at (0, 2).
    t2d = table.reshape(T, 1)
    dnums_pair = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 3),            # -> output (A, 2, 128, 1)
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    @jax.jit
    def g_pair(t, ix):
        v = jax.lax.gather(
            t, ix[..., None], dnums_pair, slice_sizes=(2, 1),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (A, 2, 128, 1)
        return jnp.sum(v.astype(jnp.float32))

    report("pair-row (A,2,128)", timeit(g_pair, table.reshape(T, 1), idx), M, 2)

    # --- 2x2 slab gather from a (T//128, 130) padded operand ------------
    rows, cols = T // 128, 130
    t_slab = jnp.pad(table.reshape(rows, 128), ((0, 1), (0, 2))).astype(
        jnp.uint32
    )[: rows + 1]
    iq = idx // 128
    im = idx % 128
    dnums_slab = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),            # -> output (A, 2, 2, 128)
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    @jax.jit
    def g_slab(t, q, m):
        starts = jnp.stack([q, m], axis=-1)  # (A, 128, 2)
        v = jax.lax.gather(
            t, starts, dnums_slab, slice_sizes=(2, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (A, 2, 2, 128)
        return jnp.sum(v.astype(jnp.float32))

    report("slab22 (A,2,2,128)", timeit(g_slab, t_slab, iq, im), M, 4)

    # --- 2x2x2 cube gather from a dense (64, 64, 64) --------------------
    W = 64
    t3d = jax.random.randint(
        jax.random.PRNGKey(2), (W, W, W), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    c3 = jax.random.randint(
        jax.random.PRNGKey(3), (A, 128, 3), 0, W - 1, dtype=jnp.int32
    )
    dnums_cube = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),         # -> output (A, 2, 2, 2, 128)
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )

    @jax.jit
    def g_cube(t, s):
        v = jax.lax.gather(
            t, s, dnums_cube, slice_sizes=(2, 2, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (A, 2, 2, 2, 128)
        return jnp.sum(v.astype(jnp.float32))

    report("cube222 (A,2,2,2,128)", timeit(g_cube, t3d, c3), M, 8)

    # --- consumer-fused variants: weight + reduce like the encode -------
    w = jax.random.uniform(jax.random.PRNGKey(4), (A, 128))

    @jax.jit
    def g_pair_consume(t, ix, w):
        v = jax.lax.gather(
            t, ix[..., None], dnums_pair, slice_sizes=(2, 1),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).astype(jnp.float32)[..., 0]          # (A, 2, 128)
        lo = v % 65536.0
        return jnp.sum((lo[:, 0] * w + lo[:, 1] * (1 - w)))

    report(
        "pair-row + consume",
        timeit(g_pair_consume, table.reshape(T, 1), idx, w), M, 2,
    )

    @jax.jit
    def g_slab_consume(t, q, m, w):
        starts = jnp.stack([q, m], axis=-1)
        v = jax.lax.gather(
            t, starts, dnums_slab, slice_sizes=(2, 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).astype(jnp.float32)                  # (A, 2, 2, 128)
        return jnp.sum(v[:, 0, 0] * w + v[:, 0, 1] + v[:, 1, 0] * (1 - w)
                       + v[:, 1, 1])

    report("slab22 + consume", timeit(g_slab_consume, t_slab, iq, im, w), M, 4)

    # --- sorted scalar (for reference: does sortedness matter) ----------
    idx_s = jnp.sort(idx.reshape(-1)).reshape(A, 128)

    @jax.jit
    def g_scalar_sorted(t, ix):
        v = jnp.take(t, ix.reshape(-1), indices_are_sorted=True)
        return jnp.sum(v.astype(jnp.float32))

    report("scalar sorted-hint", timeit(g_scalar_sorted, table, idx_s), M, 1)


if __name__ == "__main__":
    main()


def bench_complex(M=4_194_304):
    """complex64 scalar gather: if it fetches 8B/issue at the u32 rate,
    the slab layout's adjacent (x, x+1) corner pairs halve fw issues."""
    import jax
    import jax.numpy as jnp
    import time

    T = 1 << 19
    tab_f32 = jax.random.normal(jax.random.PRNGKey(0), (T, 2))
    tab_c = jax.lax.complex(tab_f32[:, 0], tab_f32[:, 1])   # (T,) c64
    A = M // 128
    idx = jax.random.randint(jax.random.PRNGKey(1), (A * 128,), 0, T - 2)

    @jax.jit
    def g_c(t, ix):
        v = jnp.take(t, ix)
        return jnp.sum(jnp.real(v) + jnp.imag(v))

    @jax.jit
    def g_2xu32(t, ix):
        v0 = jnp.take(t, ix)
        v1 = jnp.take(t, ix + 1)
        return jnp.sum((v0 + v1).astype(jnp.float32))

    def timeit1(f, *a, iters=10):
        for _ in range(2):
            out = f(*a)
        _ = float(jax.device_get(out))
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
        _ = float(jax.device_get(out))
        return (time.time() - t0) / iters

    dt = timeit1(g_c, tab_c, idx)
    print(f"complex64 scalar gather       {dt*1e3:8.2f} ms "
          f"{M/dt/1e6:8.1f} M iss/s", flush=True)
    tab_u = jax.random.randint(jax.random.PRNGKey(2), (T,), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)
    dt = timeit1(g_2xu32, tab_u, idx)
    print(f"2x u32 scalar gathers         {dt*1e3:8.2f} ms "
          f"{M/dt/1e6:8.1f} M pair/s", flush=True)


if __name__ == "__main__" and "--complex" in sys.argv:
    bench_complex()
