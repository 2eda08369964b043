"""Prototype: can Pallas TPU do vectorized dynamic gathers from a
VMEM-resident table, and how fast is a serial scatter-add loop?
Run: python -u examples/proto_pallas_gather.py"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radnerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)

T = 1 << 19
F = 2
M = 1 << 20  # 1M gathers


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    rate = M / dt / 1e6
    print(f"{name:46s} {dt*1e3:8.2f} ms  ({rate:7.1f} M ops/s)", flush=True)
    return out


key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T, F), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T)
vals = jax.random.normal(jax.random.PRNGKey(2), (M, F), jnp.float32)

# --- baseline XLA gather / scatter ---
xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
bench("XLA gather (1M from 512k x 2)", xla_gather, table, idx)

xla_scatter = jax.jit(
    lambda t, i, v: jnp.zeros_like(t).at[i].add(v)
)
bench("XLA scatter-add", xla_scatter, table, idx, vals)


# --- pallas gather via jnp.take inside kernel (VMEM table) ---
def gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


TILE = 8192


@jax.jit
def pallas_gather(table, idx):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((T, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table, idx)


try:
    out = bench("pallas gather (take in kernel)", pallas_gather, table, idx)
    ref = xla_gather(table, idx)
    print("  correct:", bool(jnp.allclose(out, ref)), flush=True)
except Exception as e:
    print("pallas take-gather FAILED:", str(e)[:300], flush=True)


# --- pallas scatter-add: serial fori_loop accumulate into VMEM table ---
def scatter_kernel(idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        r = idx_ref[i]
        out_ref[r, :] = out_ref[r, :] + val_ref[i, :]
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


@jax.jit
def pallas_scatter(idx, vals):
    return pl.pallas_call(
        scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(idx, vals)


try:
    out = bench("pallas scatter-add (serial VMEM)", pallas_scatter, idx,
                vals, iters=3)
    ref = xla_scatter(table, idx, vals)
    print("  correct:", bool(jnp.allclose(out, ref, atol=1e-3)), flush=True)
except Exception as e:
    print("pallas scatter FAILED:", str(e)[:300], flush=True)
