"""Microbench: hash-grid encode fw+bw — Pallas table-grad kernel vs XLA
scatter-add — at training-relevant sizes (reference config T=2^19, L=16,
F=2; N = rays*budget*experts point queries per step)."""

import sys
import time

import jax
import jax.numpy as jnp

from radnerf_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid_table,
)
from radnerf_tpu.ops.hashgrid_pallas import hashgrid_encode_fused
from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=8):
    # force a host transfer per iteration: under the axon relay,
    # block_until_ready alone has been observed not to wait.
    for _ in range(warmup):
        out = f(*a)
    _ = jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
        _ = jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.time() - t0) / iters


def main():
    enable_compilation_cache()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 196_608
    cfg = HashGridConfig.for_scene_scale(0.5, log2_table_size=19)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    print(f"# N={N} T=2^19 L={cfg.n_levels}", file=sys.stderr)

    def fw_xla(t, x):
        return hashgrid_encode(t, x, cfg, jnp.bfloat16).astype(jnp.float32)

    def fw_pl(t, x):
        return hashgrid_encode_fused(t, x, cfg, jnp.bfloat16).astype(
            jnp.float32
        )

    # everything reduces to a scalar INSIDE jit: the axon tunnel makes
    # device->host transfers of real arrays dominate otherwise.
    fwd = jax.jit(lambda t, x: jnp.sum(fw_xla(t, x)))
    t = timeit(fwd, table, x)
    print(f"fw only (xla gather):      {t*1e3:8.2f} ms")

    for name, f in [("xla scatter", fw_xla), ("pallas", fw_pl)]:
        g = jax.jit(
            lambda t, x, f=f: sum(
                jnp.sum(v)
                for v in jax.tree.leaves(
                    jax.grad(lambda tt: jnp.sum(f(tt, x) ** 2))(t)
                )
            )
        )
        dt = timeit(g, table, x)
        print(f"fw+bw ({name:12s}): {dt*1e3:8.2f} ms "
              f"({N/dt/1e6:.1f} Mpts/s)")


if __name__ == "__main__":
    main()
