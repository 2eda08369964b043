"""Inference-path throughput: test-time render rays/s (VERDICT gap #8).

Renders an 800x800-equivalent ray load (in chunks) against a
half-converged occupancy grid (solid 0.3-radius sphere, ~11% cells) with
a trained-scale NGP field, comparing:
  - render_test (dense alive masks; retired rays burn dead lanes)
  - render_test_compacted (host-side alive-ray compaction per phase)

Usage: python -u examples/bench_render.py [--side 800] [--chunk 65536]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from radnerf_tpu.models.ngp import NGPConfig, init_ngp, init_ngp_state
from radnerf_tpu.render.render import (
    RenderConfig, render_test, render_test_compacted,
)
from radnerf_tpu.utils import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--phase_iters", type=int, default=4)
    ap.add_argument("--k_block", type=int, default=256)
    ap.add_argument("--budget", type=int, default=8)
    ap.add_argument("--layout", type=str, default="flat",
                    choices=["flat", "dense"])
    ap.add_argument("--plain", action="store_true",
                    help="also bench the non-compacted while-loop path")
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"# devices: {jax.devices()}", flush=True)
    cfg = NGPConfig(scale=0.5, grid_size=128, log2_T=19,
                    compute_dtype="bfloat16")
    rcfg = RenderConfig(test_layout=args.layout,
                        test_k_block=args.k_block,
                        test_budget_per_ray=args.budget)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    state = init_ngp_state(cfg)
    g = cfg.grid_size
    lin = (np.arange(g) + 0.5) / g * 2 - 1
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    sphere = (np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale) < 0.3
    state = {
        **state,
        "occ": jnp.asarray(
            np.broadcast_to(sphere[None], (cfg.cascades, g, g, g))
        ),
    }

    # camera at radius 1.2 looking at origin; pinhole rays over the image
    n_rays = args.side * args.side
    eye = np.array([0.0, -1.2, 0.25], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    u, v = np.meshgrid(
        (np.arange(args.side) + 0.5) / args.side - 0.5,
        (np.arange(args.side) + 0.5) / args.side - 0.5,
    )
    dirs = (
        u[..., None] * right + v[..., None] * down + 1.2 * fwd
    ).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays_d_all = jnp.asarray(dirs, jnp.float32)
    rays_o_all = jnp.broadcast_to(jnp.asarray(eye), (n_rays, 3))

    jit_plain = jax.jit(
        lambda p, s, ro, rd: render_test(p, s, cfg, ro, rd, rcfg)
    )

    paths = [
        (f"{args.layout} + host compaction",
         lambda ro, rd: render_test_compacted(
             params, state, cfg, ro, rd, rcfg,
             phase_iters=args.phase_iters)),
    ]
    if args.plain:
        paths.insert(0, (f"render_test ({args.layout}, plain)",
                         lambda ro, rd: jit_plain(params, state, ro, rd)))
    for name, run in paths:
        # warmup on one chunk
        out = run(rays_o_all[: args.chunk], rays_d_all[: args.chunk])
        _ = float(jnp.sum(out["opacity"]))
        # two passes: the first pays per-bucket compiles (compacted path),
        # the second is the steady-state number a training run sees at
        # every validation after the first
        for label in ("cold", "warm"):
            t0 = time.time()
            total = 0
            for c0 in range(0, n_rays, args.chunk):
                c1 = min(c0 + args.chunk, n_rays)
                if c1 - c0 < args.chunk:
                    break  # skip ragged tail for timing cleanliness
                out = run(rays_o_all[c0:c1], rays_d_all[c0:c1])
                total += c1 - c0
            _ = float(jnp.sum(out["opacity"]))
            dt = time.time() - t0
            print(f"{name:28s} [{label}] {total/dt:12,.0f} rays/s "
                  f"({dt:.2f}s for {total} rays)", flush=True)


if __name__ == "__main__":
    main()
