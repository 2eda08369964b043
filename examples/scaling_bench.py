"""Data-parallel scaling harness: rays/s vs device count.

Measures the shard_map'd MoE train step at 1..N devices with the ray batch
scaled proportionally (weak scaling — the BASELINE.md protocol: >= 85%
efficiency target on a v4-16). On real TPU slices run one process per host
with --multihost semantics; on a dev box use the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -u examples/scaling_bench.py --batch_per_device 512

Prints one JSON line per device count:
    {"devices": d, "rays_per_s": r, "efficiency_vs_1": e}

(On the virtual CPU mesh the numbers validate the *path* — sharding,
collectives, compile — not real ICI bandwidth.)
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from radnerf_tpu.losses import nerf_loss, total_loss  # noqa: E402
from radnerf_tpu.models.gates import init_ray_gate  # noqa: E402
from radnerf_tpu.models.mngp import (  # noqa: E402
    MNGPConfig,
    init_mngp,
    init_mngp_state,
)
from radnerf_tpu.parallel import make_mesh, make_train_step  # noqa: E402
from radnerf_tpu.render.ml_render import ml_render_train  # noqa: E402
from radnerf_tpu.render.render import RenderConfig  # noqa: E402
from radnerf_tpu.utils import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_per_device", type=int, default=512)
    ap.add_argument("--experts", type=int, default=2)
    ap.add_argument("--log2_T", type=int, default=15)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--budget_per_ray", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--device_counts", type=str, default="",
                    help="comma list; default = powers of 2 up to all")
    args = ap.parse_args()
    enable_compilation_cache()

    n_all = len(jax.devices())
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_all]
    print(f"# devices available: {n_all}", file=sys.stderr)

    cfg = MNGPConfig(
        scale=0.5, grid_size=args.grid, log2_T=args.log2_T,
        n_experts=args.experts, compute_dtype="bfloat16",
    )
    rcfg = RenderConfig(
        layout="flat", budget_per_ray=args.budget_per_ray,
        samples_per_ray=128,
    )
    import optax

    key = jax.random.PRNGKey(0)
    params = init_mngp(key, cfg)
    gate_params = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
    state = init_mngp_state(cfg)
    g = args.grid
    lin = (np.arange(g) + 0.5) / g * 2 - 1
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    sphere = (np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale) < 0.3
    occ = np.broadcast_to(
        sphere[None, None], (cfg.n_experts, cfg.cascades, g, g, g)
    )
    state = {**state, "occ": jnp.asarray(occ)}
    optimizer = optax.adam(1e-2, eps=1e-15)

    def loss_fn(bundle, model_state, batch, data, k):
        out = ml_render_train(
            bundle["model"], model_state, cfg, bundle["gate"],
            batch["rays_o"], batch["rays_d"], batch["rays_d"], k, rcfg,
        )
        ld = nerf_loss(
            out, {"rgb": batch["rgb"]}, lambda_opacity=1e-3,
            lambda_cv_importance=1e-2, lambda_depth_mutual=5e-3,
        )
        return total_loss(ld), {"psnr": jnp.float32(0)}

    base = None
    for d in counts:
        mesh = make_mesh(d)
        step = make_train_step(loss_fn, optimizer, mesh)
        # fresh copies: the jitted step donates bundle/opt_state buffers
        bundle = jax.tree_util.tree_map(
            jnp.array, {"model": params, "gate": gate_params}
        )
        opt_state = optimizer.init(bundle)
        n_rays = args.batch_per_device * d
        rng = np.random.default_rng(0)
        o = rng.normal(size=(n_rays, 3))
        o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
        tgt = rng.uniform(-0.25, 0.25, (n_rays, 3))
        dd = tgt - o
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("ray"))
        batch = {
            "rays_o": jax.device_put(jnp.asarray(o, jnp.float32), shard),
            "rays_d": jax.device_put(jnp.asarray(dd, jnp.float32), shard),
            "rgb": jax.device_put(
                jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32),
                shard,
            ),
        }
        data = {}
        bu, os_, loss, _ = step(
            bundle, opt_state, state, batch, data, jax.random.PRNGKey(0)
        )
        _ = float(loss)  # compile + sync
        t0 = time.time()
        for i in range(args.steps):
            bu, os_, loss, _ = step(
                bu, os_, state, batch, data, jax.random.PRNGKey(i)
            )
        _ = float(loss)
        dt = time.time() - t0
        rps = args.steps * n_rays / dt
        if base is None:
            base = rps / d
        print(json.dumps({
            "devices": d,
            "rays_per_s": round(rps, 1),
            "efficiency_vs_1": round(rps / (base * d), 3),
        }))


if __name__ == "__main__":
    main()
