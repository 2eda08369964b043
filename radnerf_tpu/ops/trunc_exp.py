"""Truncated-gradient exponential — the sigma activation.

TPU twin of the reference's `TruncExp` autograd.Function
(models/custom_functions.py:162-173): forward is exp(x) in fp32, backward is
g * exp(clamp(x, -15, 15)) to avoid fp16/bf16 gradient blow-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x.astype(jnp.float32))


def _fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
