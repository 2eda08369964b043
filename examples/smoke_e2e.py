"""End-to-end smoke: fit a tiny NGP to an analytic emissive sphere.

Drives the public API exactly as a user would: build field + occupancy
state, jit a train step (render -> loss -> adam), update the density grid
every 16 steps, and report PSNR on a held-out ray batch. Runs on whatever
backend JAX picks (TPU if available).

Usage: python examples/smoke_e2e.py [--steps 300] [--moe]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from radnerf_tpu.models.ngp import (
    NGPConfig, init_ngp, init_ngp_state, ngp_forward, update_density_grid,
)
from radnerf_tpu.render.render import RenderConfig, render_train
from radnerf_tpu.losses import nerf_loss, total_loss
from radnerf_tpu.metrics import psnr


# ---- analytic ground-truth scene: a soft emissive sphere -----------------
def gt_field(x, d):
    r = jnp.linalg.norm(x, axis=-1)
    sigma = 40.0 * (r < 0.3)
    color = jnp.stack(
        [0.5 + x[:, 0], 0.5 + x[:, 1], 0.5 - x[:, 2]], axis=-1
    ).clip(0, 1)
    return sigma, color


def sample_rays(key, n):
    k1, k2 = jax.random.split(key)
    # cameras on a shell looking at the origin
    o = jax.random.normal(k1, (n, 3))
    o = o / jnp.linalg.norm(o, axis=1, keepdims=True) * 1.2
    target = jax.random.uniform(k2, (n, 3), minval=-0.25, maxval=0.25)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices())
    cfg = NGPConfig(scale=0.5, grid_size=64, n_levels=8, log2_T=15)
    rcfg = RenderConfig(samples_per_ray=128)
    key = jax.random.PRNGKey(0)
    params = init_ngp(key, cfg)
    state = init_ngp_state(cfg)
    state = {**state, "occ": jnp.ones_like(state["occ"])}

    opt = optax.adam(1e-2, eps=1e-15)
    opt_state = opt.init(params)

    def render_gt(key, rays_o, rays_d):
        out = render_train(None, state, cfg, rays_o, rays_d, key, rcfg,
                           forward_fn=gt_field)
        return out["rgb"]

    @jax.jit
    def train_step(params, opt_state, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        rays_o, rays_d = sample_rays(k1, args.batch)
        target_rgb = jax.lax.stop_gradient(render_gt(k2, rays_o, rays_d))

        def loss_fn(p):
            out = render_train(
                p, state, cfg, rays_o, rays_d, k3, rcfg,
                forward_fn=lambda x, d: ngp_forward(p, state, cfg, x, d),
            )
            ld = nerf_loss(out, {"rgb": target_rgb})
            return total_loss(ld), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, psnr(out["rgb"], target_rgb)

    grid_update = jax.jit(
        lambda p, s, k, warmup: update_density_grid(
            p, s, cfg, k, 0.01 * 1024 / np.sqrt(3), warmup
        ),
        static_argnames="warmup",
    )

    t0 = time.time()
    first_psnr = last_psnr = None
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        if step % 16 == 0 and step > 0:
            key, gk = jax.random.split(key)
            state = grid_update(params, state, gk, step < 256)
        params, opt_state, loss, p = train_step(params, opt_state, state, sub)
        if step == 0:
            first_psnr = float(p)
            print(f"step 0: loss={float(loss):.5f} psnr={first_psnr:.2f} "
                  f"(compile+step {time.time()-t0:.1f}s)")
        if step % 50 == 0 or step == args.steps - 1:
            last_psnr = float(p)
            print(f"step {step}: loss={float(loss):.5f} psnr={last_psnr:.2f}")

    dt = time.time() - t0
    rays_per_s = args.steps * args.batch / dt
    print(f"\n{args.steps} steps in {dt:.1f}s  ->  {rays_per_s:,.0f} rays/s "
          f"(incl. compile)")
    print(f"PSNR {first_psnr:.2f} -> {last_psnr:.2f}")
    assert last_psnr > first_psnr + 5.0, "training did not converge"
    print("SMOKE PASS")


if __name__ == "__main__":
    main()
