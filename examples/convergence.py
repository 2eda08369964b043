"""Convergence evidence runs (VERDICT round-2 gap #3).

Two recorded experiments, each emitting a JSONL curve + one summary line:

  sphere — fit an NGP to the analytic emissive sphere for --steps steps,
      evaluating PSNR on a FIXED held-out ray set every --eval_every.
      Compares compute dtypes (f32 vs bf16 drift) and hash impls
      (tcnn-style 'dedup' xor hash vs the TPU 'slab' layout — the PSNR
      A/B that justifies slab as the fast default).

  scene — the full NeRFSystem trainer on the synthetic NSVF fixture scene
      (tests/fixtures.py), --steps steps, validation PSNR on held-out
      views. Exercises the user-facing path end-to-end (matches the role
      of the reference's 20-epoch README runs, README.md:78-92).

Usage:
  python examples/convergence.py sphere --steps 2000 --impl slab \
      --dtype bfloat16 --out docs/curves/sphere_slab_bf16.jsonl
  python examples/convergence.py scene --steps 2000 --out ...
Results are summarized in docs/CONVERGENCE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))      # examples/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_sphere(args):
    import jax
    import jax.numpy as jnp
    import optax

    from radnerf_tpu.losses import nerf_loss, total_loss
    from radnerf_tpu.metrics import psnr
    from radnerf_tpu.models.ngp import (
        NGPConfig, init_ngp, init_ngp_state, ngp_forward,
        update_density_grid,
    )
    from radnerf_tpu.render.render import RenderConfig, render_train
    from radnerf_tpu.utils import enable_compilation_cache
    from smoke_e2e import gt_field, sample_rays

    enable_compilation_cache()
    cfg = NGPConfig(
        scale=0.5, grid_size=64, n_levels=args.levels, log2_T=args.log2_T,
        compute_dtype=args.dtype, hash_impl=args.impl,
    )
    rcfg = RenderConfig(samples_per_ray=128, layout=args.layout,
                        budget_per_ray=64)
    key = jax.random.PRNGKey(args.seed)
    params = init_ngp(key, cfg)
    state = init_ngp_state(cfg)
    # Analytic occupancy of the ground-truth sphere (radius 0.3 + one-cell
    # margin). The GT render ALWAYS uses it (full-quality target); the
    # model starts from it too (a realistic converged grid — an all-ones
    # grid plus the static per-ray budget would front-truncate the march
    # before the sphere is ever sampled) and refines it with the usual
    # density-grid updates.
    G = cfg.grid_size
    lin = (np.arange(G) + 0.5) / G * 2.0 - 1.0
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    r_cell = np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale
    occ0 = jnp.asarray(
        np.broadcast_to(
            (r_cell < 0.3 + 2.0 * cfg.scale * 2 / G)[None],
            (cfg.cascades, G, G, G),
        )
    )
    gt_state = {**state, "occ": occ0}
    state = {**state, "occ": occ0}
    opt = optax.adam(1e-2, eps=1e-15)
    opt_state = opt.init(params)

    def render_gt(key, rays_o, rays_d):
        out = render_train(None, gt_state, cfg, rays_o, rays_d, key, rcfg,
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
            return total_loss(nerf_loss(out, {"rgb": target_rgb}))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # fixed held-out evaluation rays + ground truth (key independent of
    # training stream; jitter key fixed so eval is deterministic)
    ek = jax.random.PRNGKey(10_000 + args.seed)
    eo, ed = sample_rays(ek, 4096)
    egt = render_gt(jax.random.PRNGKey(1), eo, ed)

    @jax.jit
    def eval_psnr(params, state):
        out = render_train(
            params, state, cfg, eo, ed, jax.random.PRNGKey(1), rcfg,
            forward_fn=lambda x, d: ngp_forward(params, state, cfg, x, d),
        )
        return psnr(out["rgb"], egt)

    grid_update = jax.jit(
        lambda p, s, k, warmup: update_density_grid(
            p, s, cfg, k, 0.01 * 1024 / np.sqrt(3), warmup
        ),
        static_argnames="warmup",
    )

    rows = []
    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        if step % 16 == 0 and step > 0:
            key, gk = jax.random.split(key)
            state = grid_update(params, state, gk, step < 256)
        params, opt_state, loss = train_step(params, opt_state, state, sub)
        if step % args.eval_every == 0 or step == args.steps - 1:
            row = {
                "step": step,
                "psnr": round(float(eval_psnr(params, state)), 3),
                "loss": round(float(loss), 6),
                "t": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    summary = {
        "exp": "sphere", "impl": args.impl, "dtype": args.dtype,
        "layout": args.layout, "steps": args.steps, "batch": args.batch,
        "final_psnr": rows[-1]["psnr"],
        "best_psnr": max(r["psnr"] for r in rows),
        "wall_s": rows[-1]["t"],
        "backend": jax.default_backend(),
    }
    return rows, summary


def run_scene(args):
    import jax

    from radnerf_tpu.train.trainer import NeRFSystem
    from tests.fixtures import make_nsvf_dataset
    from tests.test_trainer import HP

    root = args.scene_root or make_nsvf_dataset(
        os.path.join("/tmp", f"conv_scene_{args.seed}")
    )
    hp = HP(
        root,
        compute_dtype=args.dtype,
        hash_table_size=15,
        batch_size=args.batch,
        num_epochs=1,
        seed=args.seed,
    )
    hp.hash_impl = args.impl
    system = NeRFSystem(hp)
    system.setup()
    system.train_dataset.STEPS_PER_EPOCH = args.steps
    system.configure_optimizers()
    system.build_steps()
    system.update_grid(warmup=True)

    rows = []
    t0 = time.time()
    for step in range(args.steps):
        if step % 16 == 0 and step > 0:
            system.update_grid(warmup=step < 256)
        system.key, kb, ks = jax.random.split(system.key, 3)
        batch = system._shard(system.sample_batch_indices(kb))
        (system.trainable, system.opt_state, loss, aux) = system.train_step(
            system.trainable, system.opt_state, system.model_state,
            batch, system.data, ks,
        )
        system.params = system.trainable["model"]
        if step % args.eval_every == 0 or step == args.steps - 1:
            val = system.validate(epoch=0)
            row = {
                "step": step, "val_psnr": round(val["psnr"], 3),
                "train_psnr": round(float(aux["psnr"]), 3),
                "loss": round(float(loss), 6),
                "t": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    summary = {
        "exp": "scene", "impl": args.impl, "dtype": args.dtype,
        "steps": args.steps, "batch": args.batch,
        "final_val_psnr": rows[-1]["val_psnr"],
        "best_val_psnr": max(r["val_psnr"] for r in rows),
        "wall_s": rows[-1]["t"],
        "backend": jax.default_backend(),
    }
    return rows, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["sphere", "scene"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--impl", type=str, default="auto")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--layout", type=str, default="flat")
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--log2_T", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene_root", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    rows, summary = (
        run_sphere(args) if args.exp == "sphere" else run_scene(args)
    )
    print("SUMMARY " + json.dumps(summary), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
