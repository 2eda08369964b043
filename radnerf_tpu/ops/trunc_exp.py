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
    # zero-size dtype token: residuals must be JAX types
    return jnp.exp(x32), (x32, jnp.zeros((0,), x.dtype))


def _bwd(res, g):
    x32, dtype_token = res
    grad = g * jnp.exp(jnp.clip(x32, -15.0, 15.0))
    # cotangent must match the primal dtype (bf16 inputs get bf16 grads,
    # computed in fp32 first — the custom_bwd AMP behavior)
    return (grad.astype(dtype_token.dtype),)


trunc_exp.defvjp(_fwd, _bwd)
