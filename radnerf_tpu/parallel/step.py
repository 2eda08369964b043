"""shard_map'd data-parallel training step.

The step is written once against per-device shapes; `shard_map` lays it over
the `ray` mesh axis. Gradients are `jax.lax.pmean`ed over the axis — the
TPU-native equivalent of DDP all-reduce, riding ICI and overlapped with the
backward pass by XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6
    from jax import shard_map

    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _sm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def microbatched_value_and_grad(loss3, microbatch: int):
    """Gradient accumulation: split the batch into `microbatch` sequential
    slices under lax.scan and average (loss, aux, grads).

    `loss3(params, batch, key) -> (loss, aux)`; batch leaves split on the
    leading axis. The expected gradient is identical to one full-batch
    pass at a fraction of the peak memory (measured: batch 8192 falls off
    a v5e-1 throughput cliff that batch<=4096 avoids — PERF_NOTES.md);
    batch-statistic loss terms (the MoE cv load-balance loss) become
    per-microbatch estimates averaged, a documented deviation."""
    tmap = jax.tree_util.tree_map

    def vg(params, batch, key):
        def split(x):
            n = x.shape[0]
            assert n % microbatch == 0, (
                f"batch {n} not divisible by microbatch {microbatch}"
            )
            return x.reshape((microbatch, n // microbatch) + x.shape[1:])

        mb = tmap(split, batch)

        # every slice sees the SAME key: per-ray randomness is derived
        # from global ray ids inside the loss, so slicing must not change
        # it — this makes microbatch=N bitwise-equivalent (up to summation
        # order) to the full-batch pass
        def one(m):
            (loss, aux), grads = jax.value_and_grad(
                loss3, has_aux=True
            )(params, m, key)
            return loss, tmap(lambda x: x.astype(jnp.float32), aux), grads

        def body(carry, m):
            loss, aux, grads = one(m)
            cl, ca, cg = carry
            return (
                cl + loss, tmap(jnp.add, ca, aux), tmap(jnp.add, cg, grads),
            ), None

        shapes = jax.eval_shape(one, tmap(lambda x: x[0], mb))
        zeros = tmap(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        (loss, aux, grads), _ = jax.lax.scan(body, zeros, mb)
        inv = 1.0 / microbatch
        return (
            loss * inv, tmap(lambda x: x * inv, aux)
        ), tmap(lambda g: g * inv, grads)

    return vg


def shard_batch(batch: dict, mesh: Mesh, axis: str = "ray") -> dict:
    """Place a host batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def make_train_step(
    loss_fn,
    optimizer,
    mesh: Mesh,
    axis: str = "ray",
    donate: bool = True,
    microbatch: int = 0,
):
    """Build the jitted data-parallel step.

    Args:
        loss_fn: (params, model_state, batch, data, key) -> (loss, aux).
            Written for a LOCAL shard of rays; `data` (e.g. the ray store)
            is replicated.
        optimizer: an optax GradientTransformation.
        mesh: 1-D device mesh.
        microbatch: if > 1, split the local ray shard into this many
            sequential microbatches under lax.scan and average losses and
            gradients — identical expected gradient at a fraction of the
            peak memory (measured: batch 8192 falls off a throughput
            cliff on v5e-1 that batch<=4096 avoids; docs/PERF_NOTES.md).
            Batch-statistic loss terms (the MoE cv load-balance loss)
            are then estimated per microbatch and averaged — a documented
            deviation from one full-batch estimate.
    Returns:
        step(params, opt_state, model_state, batch, data, key)
            -> (params, opt_state, loss, aux)
        with params/opt_state/model_state/data replicated, batch sharded on
        its leading axis.
    """

    def local_step(params, opt_state, model_state, batch, data, key):
        # NOTE: the key is NOT folded by device index. Per-ray randomness
        # (start jitter) is derived from global ray ids inside loss_fn, so
        # it is already decorrelated across rays AND device-count
        # invariant; remaining whole-batch draws (random background) must
        # be shared across devices to match single-device semantics.
        loss3 = lambda p, b, k: loss_fn(p, model_state, b, data, k)
        if microbatch and microbatch > 1:
            vg = microbatched_value_and_grad(loss3, microbatch)
        else:
            vg = jax.value_and_grad(loss3, has_aux=True)
        (loss, aux), grads = vg(params, batch, key)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        aux = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            aux,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return params, opt_state, loss, aux

    sharded = _shard_map(
        local_step,
        mesh,
        in_specs=(P(), P(), P(), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    donate_args = (0, 1) if donate else ()
    return jax.jit(sharded, donate_argnums=donate_args)


def make_grad_fn(loss_fn, mesh: Mesh, axis: str = "ray"):
    """Jitted (loss, grads) over the mesh — the optimizer-free core of
    make_train_step, used by the DP-equivalence test to assert that the
    pmean'd gradients are identical for any device count."""

    def local(params, model_state, batch, data, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, batch, data, key
        )
        return jax.lax.pmean(loss, axis), jax.lax.pmean(grads, axis)

    return jax.jit(_shard_map(
        local, mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P()),
    ))
