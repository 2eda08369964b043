"""Switch-NeRF rendering: the single-field render pipeline with the
switch model's point-gated field, surfacing per-sample gate results for the
load-balancing loss (the reference routed this through render()'s
moe_training/return_gate kwargs, rendering.py:217-220)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.switch import SwitchNGPConfig, switch_forward
from .render import RenderConfig, render_test, render_train


def switch_render_train(
    params: dict,
    state: dict,
    cfg: SwitchNGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
) -> dict:
    k_render, k_gate = jax.random.split(key)

    def fwd(x, d):
        sig, rgb, gate_results = switch_forward(
            params, state, cfg, x, d, key=k_gate, train=True
        )
        return sig, rgb, gate_results

    out = render_train(
        None, state, cfg, rays_o, rays_d, k_render, rcfg, forward_fn=fwd
    )
    gr = out.pop("gate_results")
    out["gating_code"] = gr["code"]            # (N*S, K) per-sample
    out["gating_importance"] = gr["importance"]
    return out


def switch_render_test(
    params: dict,
    state: dict,
    cfg: SwitchNGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rcfg: RenderConfig,
) -> dict:
    def fwd(x, d):
        sig, rgb, _ = switch_forward(
            params, state, cfg, x, d, key=None, train=False
        )
        return sig, rgb

    return render_test(
        None, state, cfg, rays_o, rays_d, rcfg, forward_fn=fwd
    )
