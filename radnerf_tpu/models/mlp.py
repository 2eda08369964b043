"""Small fused-width MLPs.

TPU twin of tinycudann's FullyFusedMLP / CUTLASSMLP (64-wide, 1-4 hidden
layers; reference networks.py:57-89, 269-289, 1075-1085). On TPU a 64-wide
matmul chain is a few MXU passes that XLA fuses with the surrounding
elementwise work — no custom kernel needed at these widths; batching (large
N) is what keeps the MXU fed.

Deviation from tcnn noted for the record: tcnn MLPs are bias-free and
one-pad the input to the tensor-core width; we use standard dense layers
with biases and He-uniform init. This changes initialization statistics,
not capacity; parity targets are end-metric (PSNR), not bitwise.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _he_uniform(key, shape, dtype):
    fan_in = shape[0]
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    n_hidden: int,
    dtype=jnp.float32,
) -> dict:
    """Create params for an MLP with `n_hidden` hidden layers of width
    `hidden_dim` and ReLU activations (tcnn layer-count convention:
    n_hidden_layers counts the hidden matmuls, so there are n_hidden+1
    weight matrices)."""
    dims = [in_dim] + [hidden_dim] * n_hidden + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    ws, bs = [], []
    for i, k in enumerate(keys):
        ws.append(_he_uniform(k, (dims[i], dims[i + 1]), dtype))
        bs.append(jnp.zeros((dims[i + 1],), dtype))
    return {"w": ws, "b": bs}


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    out_act: str | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Apply the MLP. ReLU between layers; `out_act` in
    {None, 'sigmoid', 'exp'} on the output (tcnn output_activation)."""
    h = x.astype(compute_dtype)
    n = len(params["w"])
    for i in range(n):
        w = params["w"][i].astype(compute_dtype)
        b = params["b"][i].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=compute_dtype) + b
        if i < n - 1:
            h = jax.nn.relu(h)
    if out_act == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif out_act == "exp":
        h = jnp.exp(h)
    return h


def init_stacked_mlp(
    key: jax.Array,
    n_stack: int,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    n_hidden: int,
    dtype=jnp.float32,
) -> dict:
    """Per-expert MLP weights stacked on a leading (K, ...) axis.

    Replaces the reference's `setattr(self, 'geo_net_{i}', ...)` loop
    (networks.py:269-289) with a vmap-able parameter layout."""
    keys = jax.random.split(key, n_stack)
    return jax.vmap(
        lambda k: init_mlp(k, in_dim, hidden_dim, out_dim, n_hidden, dtype)
    )(keys)


def slice_stacked(params: dict, ind) -> dict:
    """Select one expert's weights from a stacked MLP (traced index ok)."""
    return jax.tree_util.tree_map(lambda p: p[ind], params)
