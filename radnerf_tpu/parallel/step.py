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
):
    """Build the jitted data-parallel step.

    Args:
        loss_fn: (params, model_state, batch, data, key) -> (loss, aux).
            Written for a LOCAL shard of rays; `data` (e.g. the ray store)
            is replicated.
        optimizer: an optax GradientTransformation.
        mesh: 1-D device mesh.
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
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model_state, batch, data, key
        )
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
