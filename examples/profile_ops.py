"""Per-op microbenchmarks on the current backend — identifies the hot spots
to hand to Pallas. Usage: python -u examples/profile_ops.py"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from radnerf_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_encode, init_hashgrid_table,
)
from radnerf_tpu.ops.marching import MarchConfig, march_rays_train
from radnerf_tpu.ops.compositing import composite_train
from radnerf_tpu.models.mlp import init_mlp, apply_mlp
from radnerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


N_PTS = 262144  # 2048 rays x 128 samples

# --- hash grid ---
cfg = HashGridConfig.for_scene_scale(0.5, log2_table_size=19)
table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (N_PTS, 3))

enc = jax.jit(lambda t, x: hashgrid_encode(t, x, cfg, jnp.bfloat16))
bench("hashgrid fwd (262k pts, L16 T2^19)", enc, table, x)

enc_grad = jax.jit(
    jax.grad(lambda t, x: hashgrid_encode(t, x, cfg, jnp.bfloat16)
             .astype(jnp.float32).sum())
)
bench("hashgrid fwd+bwd", enc_grad, table, x)

# --- marching ---
mcfg = MarchConfig(scale=0.5, cascades=1, samples_per_ray=128)
occ = jnp.asarray(
    np.random.default_rng(0).random((1, 128, 128, 128)) < 0.11
)
o = jax.random.normal(jax.random.PRNGKey(2), (2048, 3))
o = o / jnp.linalg.norm(o, axis=1, keepdims=True) * 1.2
d = -o / jnp.linalg.norm(o, axis=1, keepdims=True)
t1 = jnp.full((2048,), 0.7)
t2 = jnp.full((2048,), 1.7)
march = jax.jit(
    lambda o, d, t1, t2, occ: march_rays_train(o, d, t1, t2, occ, mcfg)
)
bench("march (2048 rays, K=1024 cand)", march, o, d, t1, t2, occ)

# --- compositing ---
sig = jax.random.uniform(jax.random.PRNGKey(3), (2048, 128)) * 10
rgbs = jax.random.uniform(jax.random.PRNGKey(4), (2048, 128, 3))
deltas = jnp.full((2048, 128), 0.002)
ts = jnp.cumsum(deltas, 1) + 0.7
valid = jnp.ones((2048, 128), bool)
comp = jax.jit(
    lambda s, r: composite_train(s, r, deltas, ts, valid)["rgb"].sum()
)
bench("composite fwd (2048x128)", comp, sig, rgbs)
comp_g = jax.jit(jax.grad(lambda s: composite_train(
    s, rgbs, deltas, ts, valid)["rgb"].sum()))
bench("composite fwd+bwd", comp_g, sig)

# --- MLPs ---
geo = init_mlp(jax.random.PRNGKey(5), 32, 64, 17, 1)
feat = jax.random.normal(jax.random.PRNGKey(6), (N_PTS, 32), jnp.bfloat16)
mlp = jax.jit(lambda p, f: apply_mlp(p, f, compute_dtype=jnp.bfloat16))
bench("geo MLP fwd (262k x 32->64->17)", mlp, geo, feat)
mlp_g = jax.jit(jax.grad(
    lambda p, f: apply_mlp(p, f, compute_dtype=jnp.bfloat16)
    .astype(jnp.float32).sum(), argnums=0))
bench("geo MLP fwd+bwd", mlp_g, geo, feat)
