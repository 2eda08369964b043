"""Microbench: hash-grid table-gradient strategies on the real chip.

Compares, at training-relevant sizes (T=2^19, L=16, F=2):
  - fw gather only (honest: scalar reduced inside jit)
  - fw+bw with XLA scatter-add backward (autodiff of the gather)
  - fw+bw with the Pallas serial row-RMW kernel (round-1 winner)
  - fw+bw with the sort-based backward (ops/hashgrid_sort.py)
  - component costs of the sort path: lax.sort, cumsum, searchsorted

Usage: python examples/bench_scatter.py [N_points]
"""

import sys
import time

import jax
import jax.numpy as jnp

from radnerf_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_indices,
    init_hashgrid_table,
)
from radnerf_tpu.ops.hashgrid_pallas import hashgrid_encode_fused
from radnerf_tpu.ops.hashgrid_sort import (
    hashgrid_encode_sort,
    segment_totals_sorted,
)
from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=8):
    # Honest protocol for the axon tunnel: f must return a scalar (reduced
    # inside jit); device_get of the scalar is the only reliable sync.
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 196_608
    cfg = HashGridConfig.for_scene_scale(0.5, log2_table_size=19)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
    n_upd = L * N * 8
    print(f"# N={N} T=2^19 L={L} -> {n_upd/1e6:.1f}M updates", flush=True)

    def report(name, dt):
        print(f"{name:34s} {dt*1e3:9.2f} ms  "
              f"({n_upd/dt/1e6:8.1f} M upd/s)", flush=True)

    # fw only
    fwd = jax.jit(
        lambda t, x: jnp.sum(
            hashgrid_encode(t, x, cfg, jnp.bfloat16).astype(jnp.float32)
        )
    )
    report("fw only (xla gather)", timeit(fwd, table, x))

    # fw+bw variants
    from radnerf_tpu.ops.hashgrid_window import (
        hashgrid_encode_window,
        sorted_table_grad_window,
    )
    for name, f in [
        ("xla scatter", hashgrid_encode),
        ("pallas RMW", lambda t, xx, c, d: hashgrid_encode_fused(t, xx, c, d)),
        ("sort-based", lambda t, xx, c, d: hashgrid_encode_sort(t, xx, c, d)),
        ("sorted-window",
         lambda t, xx, c, d: hashgrid_encode_window(t, xx, c, d)),
    ]:
        g = jax.jit(
            lambda t, xx, f=f: jnp.sum(
                jax.grad(
                    lambda tt: jnp.sum(
                        f(tt, xx, cfg, jnp.bfloat16).astype(jnp.float32) ** 2
                    )
                )(t)
            )
        )
        try:
            report(f"fw+bw ({name})", timeit(g, table, x))
        except Exception as e:
            print(f"fw+bw ({name}) FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # components of the sort path
    idx, w = jax.jit(lambda xx: hashgrid_indices(xx, cfg))(x)
    keys = idx.reshape(L, N * 8)
    v = w.reshape(L, N * 8).astype(jnp.float32)

    sort3 = jax.jit(
        lambda k, a, b: jax.lax.sort(
            (k, a, b), dimension=-1, num_keys=1, is_stable=False
        )[1].sum()
    )
    report("  lax.sort (1 key + 2 payload)", timeit(sort3, keys, v, v))

    sort1 = jax.jit(
        lambda k: jax.lax.sort((k,), dimension=-1, num_keys=1)[0].sum()
    )
    report("  lax.sort (key only)", timeit(sort1, keys))

    cs = jax.jit(lambda a: jnp.cumsum(a, axis=-1).sum())
    report("  cumsum", timeit(cs, v))

    sk = jax.jit(
        lambda k: jax.lax.sort((k,), dimension=-1, num_keys=1)[0]
    )(keys)

    # scatter-add variants
    def sorted_scatter(sk_, v_):
        out = jnp.zeros((L, T), jnp.float32)
        return out.at[
            jnp.arange(L)[:, None], sk_
        ].add(v_, indices_are_sorted=True).sum()

    report("  scatter-add scalar (sorted)",
           timeit(jax.jit(sorted_scatter), sk, v))

    def sorted_scatter_rows(sk_, v_):
        out = jnp.zeros((L, T, 2), jnp.float32)
        return out.at[jnp.arange(L)[:, None], sk_].add(
            jnp.stack([v_, v_], -1), indices_are_sorted=True
        ).sum()

    report("  scatter-add F=2 rows (sorted)",
           timeit(jax.jit(sorted_scatter_rows), sk, v))

    # windowed Pallas scatter alone (on a pre-sorted stream)
    wsc = jax.jit(
        lambda k_, a_, b_: sorted_table_grad_window(k_, a_, b_, T).sum()
    )
    report("  window-scatter kernel alone", timeit(wsc, sk, v, v))

    # gather variants (forward path candidates)
    tb = jnp.asarray(table[:, :, 0])  # (L, T) f32
    def g_unsorted(t_, k_):
        return jnp.take_along_axis(t_, k_, axis=-1).sum()

    report("  gather scalar (unsorted)", timeit(jax.jit(g_unsorted), tb, keys))

    def g_sorted(t_, k_):
        return t_.at[jnp.arange(L)[:, None], k_].get(
            indices_are_sorted=True
        ).sum()

    report("  gather scalar (sorted hint)", timeit(jax.jit(g_sorted), tb, sk))

    def g_rows2_sorted(t_, k_):
        return t_.at[jnp.arange(L)[:, None], k_].get(
            indices_are_sorted=True
        ).sum()

    report("  gather F=2 rows (sorted hint)",
           timeit(jax.jit(g_rows2_sorted), table, sk))

    # full fw pipeline: sort (key,id) -> sorted gather -> sort back by id
    def fw_sorted_pipeline(t_, k_):
        ids = jnp.broadcast_to(
            jnp.arange(k_.shape[-1], dtype=jnp.int32), k_.shape
        )
        sk_, sid = jax.lax.sort((k_, ids), dimension=-1, num_keys=1)
        vals = t_.at[jnp.arange(L)[:, None], sk_].get(
            indices_are_sorted=True
        )
        _, back = jax.lax.sort((sid, vals), dimension=-1, num_keys=1)
        return back.sum()

    report("  fw sort->gather->unsort", timeit(jax.jit(fw_sorted_pipeline),
                                               tb, keys))

    # wide-row gathers: does row width cost anything? (rows/s vs 4B rows)
    for width in (2, 16, 64):
        src = jax.random.normal(jax.random.PRNGKey(2), (T, width),
                                jnp.bfloat16)
        ridx = jax.random.randint(jax.random.PRNGKey(3), (N * 8,), 0, T)
        gw = jax.jit(
            lambda s_, i_: jnp.take(s_, i_, axis=0).astype(jnp.float32).sum()
        )
        dt = timeit(gw, src, ridx)
        print(f"  gather {N*8/1e6:.1f}M rows width {width:3d}      "
              f"{dt*1e3:9.2f} ms  ({N*8/dt/1e6:8.1f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
