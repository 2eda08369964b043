"""Microbench: brick (xy-patch, 2 rows/point) vs brick3 (cube, 1 row/point,
runs-dedup fw) encode at training shapes — fw and fw+bw on a realistic
RAY-ORDERED sample stream (the runs dedup's operating regime) and on a
random stream (its fallback regime)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from radnerf_tpu.ops.hashgrid import HashGridConfig, init_hashgrid_table
from radnerf_tpu.ops.hashgrid_brick import hashgrid_encode_brick
from radnerf_tpu.ops.hashgrid_brick3 import hashgrid_encode_brick3
from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=8):
    for _ in range(warmup):
        out = f(*a)
    _ = jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
        _ = jax.device_get(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.time() - t0) / iters


def ray_stream(n, seed=1, samples_per_ray=48):
    """dt_min-lattice ray-ordered stream, like the flat training layout."""
    rng = np.random.default_rng(seed)
    n_rays = n // samples_per_ray
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.1
    d = -o + rng.normal(size=(n_rays, 3)) * 0.05
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    dt = 2.0 * np.sqrt(3.0) / 1024.0
    t0 = 0.4 + rng.random(n_rays)[:, None] * 0.2
    t = t0 + np.arange(samples_per_ray)[None, :] * dt
    pts = (o[:, None] + t[:, :, None] * d[:, None]).reshape(-1, 3)
    pts = np.clip(pts * 0.45 + 0.5, 1e-3, 1 - 1e-3)[:n]
    return jnp.asarray(pts, jnp.float32)


def main():
    enable_compilation_cache()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 196_608
    cfg = HashGridConfig.for_scene_scale(0.5, log2_table_size=19)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid_table(key, cfg)
    xs = {
        "ray": ray_stream(N),
        "rand": jax.random.uniform(jax.random.PRNGKey(2), (N, 3)),
    }
    print(f"# N={N} T=2^19 L={cfg.n_levels} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    variants = {
        "brick  (2-row)": lambda t, x: hashgrid_encode_brick(
            t, x, cfg, jnp.bfloat16),
        "brick3 (plain)": lambda t, x: hashgrid_encode_brick3(
            t, x, cfg, jnp.bfloat16, fw_mode="plain"),
        "brick3 (runs) ": lambda t, x: hashgrid_encode_brick3(
            t, x, cfg, jnp.bfloat16, fw_mode="runs"),
    }
    for sname, x in xs.items():
        for name, f in variants.items():
            fwd = jax.jit(
                lambda t, x, f=f: jnp.sum(f(t, x).astype(jnp.float32)))
            tf = timeit(fwd, table, x)
            g = jax.jit(
                lambda t, x, f=f: sum(
                    jnp.sum(v) for v in jax.tree.leaves(
                        jax.grad(lambda tt: jnp.sum(
                            f(tt, x).astype(jnp.float32) ** 2))(t))))
            tg = timeit(g, table, x)
            print(f"{sname:5s} {name}: fw {tf*1e3:7.2f} ms   "
                  f"fw+bw {tg*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
