"""Gating networks for MoE training.

- `Ray_Gate` twin (reference: models/networks.py:1070-1097): the canonical
  Rad-NeRF gate. A 6-d ray descriptor (origin ‖ direction, or origin ‖
  mean-image-direction for gate_type='image') -> FullyFusedMLP 6->64x4->K
  -> softmax. Returns (gate, importance = gate.sum(0), top_k_indices=None).
  ~0.2% of model params (README.md:5).

- `Point_Gate` twin (reference: switch_networks.py:288-404): the
  Switch-NeRF-style noisy top-1 point gate — two MLPs (clean logits +
  noise stddev), train-time Gaussian noise, top-(k+1) load estimation
  via `_prob_in_top_k`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mlp import apply_mlp, init_mlp


def init_ray_gate(
    key: jax.Array, out_dim: int, hidden: int = 64, n_hidden: int = 4
) -> dict:
    return {"encoder": init_mlp(key, 6, hidden, out_dim, n_hidden)}


def apply_ray_gate(
    params: dict, x: jnp.ndarray, compute_dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray, None]:
    """Softmax gate over experts (networks.py:1087-1093).

    Args:
        x: (N, 6) ray descriptors.
    Returns:
        gate (N, K) f32, importance (K,), top_k_indices (None — dense
        soft gating has no routing).
    """
    logits = apply_mlp(params["encoder"], x, compute_dtype=compute_dtype)
    gate = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    importance = gate.sum(axis=0)
    return gate, importance, None


# ---------------------------------------------------------------------------
# Point gate (Switch-NeRF baseline)
# ---------------------------------------------------------------------------

def init_point_gate(
    key: jax.Array,
    in_dim: int,
    n_experts: int,
    hidden: int = 64,
    n_hidden: int = 2,   # switch_networks.py:303 (2 hidden layers)
) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w_gate": init_mlp(k1, in_dim, hidden, n_experts, n_hidden),
        "w_noise": init_mlp(k2, in_dim, hidden, n_experts, n_hidden),
    }


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0)))


def _prob_in_top_k(clean, noisy, noise_std, noisy_top, k):
    """P(value stays in top-k under re-noising)
    (switch_networks.py:359-395, Shazeer'17 eq. 9): values currently in the
    top-k are compared against the (k+1)th noisy value, values outside
    against the kth."""
    thr_in = noisy_top[:, k : k + 1]        # (k+1)th largest
    thr_out = noisy_top[:, k - 1 : k]       # kth largest
    is_in = noisy > thr_in
    prob_if_in = _normal_cdf((clean - thr_in) / noise_std)
    prob_if_out = _normal_cdf((clean - thr_out) / noise_std)
    return jnp.where(is_in, prob_if_in, prob_if_out)


def apply_point_gate(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array | None,
    k: int = 1,
    noise_eps: float = 1e-2,
    train: bool = True,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Noisy top-k gating (switch_networks.py:362-404).

    Returns:
        gate (N, K): sparse softmax weights (zero outside top-k),
        load (K,): differentiable expected load,
        top_idx (N, k): selected expert indices.
    """
    clean = apply_mlp(params["w_gate"], x, compute_dtype=compute_dtype)
    clean = clean.astype(jnp.float32)
    n_experts = clean.shape[1]
    if train and key is not None:
        raw_std = apply_mlp(
            params["w_noise"], x, compute_dtype=compute_dtype
        ).astype(jnp.float32)
        noise_std = jax.nn.softplus(raw_std) + noise_eps
        noisy = clean + jax.random.normal(key, clean.shape) * noise_std
    else:
        noise_std = None
        noisy = clean

    kk = min(k + 1, n_experts)
    top_vals, top_idx_all = jax.lax.top_k(noisy, kk)
    top_idx = top_idx_all[:, :k]
    top_w = jax.nn.softmax(top_vals[:, :k], axis=1)
    gate = jnp.zeros_like(noisy)
    gate = jax.vmap(lambda g, i, w: g.at[i].set(w))(gate, top_idx, top_w)

    if train and noise_std is not None and k < n_experts:
        load = _prob_in_top_k(clean, noisy, noise_std, top_vals, k).sum(0)
    else:
        load = (gate > 0).astype(jnp.float32).sum(0)
    return gate, load, top_idx
