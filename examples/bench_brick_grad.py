"""Microbench: the brick table-gradient path alone on the real chip.

Times hashgrid_table_grad_brick (stream build + f16x2 pack + lax.sort +
window kernel + unpack) and its pieces at training-relevant sizes
(T=2^19, L=16, F=2, N samples), to attribute the table-backward share of
the train step (docs/PERF_NOTES.md round-4 anatomy).

Usage: python -u examples/bench_brick_grad.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

from radnerf_tpu.ops.hashgrid import HashGridConfig
from radnerf_tpu.ops.hashgrid_brick import (
    _bwd_streams,
    hashgrid_table_grad_brick,
)
from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=8):
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = HashGridConfig.for_scene_scale(0.5)
    print(f"# devices: {jax.devices()}  N={N}", flush=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (N, 3))
    g = jax.random.normal(k2, (N, cfg.n_levels * cfg.n_features)) * 1e-3

    full = jax.jit(
        lambda x, g: jnp.sum(hashgrid_table_grad_brick(x, g, cfg))
    )
    streams = jax.jit(
        lambda x, g: sum(
            jnp.sum(v) for v in _bwd_streams(x, g, cfg)[1]
        )
    )

    def sort_only(x, g):
        key, v = _bwd_streams(x, g, cfg)
        sk, *sv = jax.lax.sort(
            (key, *[p.astype(jnp.float32) for p in v[:4]]),
            dimension=-1, num_keys=1, is_stable=False,
        )
        return jnp.sum(sv[0]) + jnp.sum(sk)

    sort_j = jax.jit(sort_only)

    for name, f in (("table grad full", full),
                    ("  stream build", streams),
                    ("  build + sort(4xf32)", sort_j)):
        dt = timeit(f, x, g)
        print(f"{name:24s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
