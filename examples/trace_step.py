"""Trace-level attribution of the bench.py training step.

Runs the exact bench-config train step under jax.profiler.trace and
aggregates the TPU device plane's HLO-event durations by op + source
line (the per-op ground truth the subtraction-based profile_step.py
cannot give). Prints the top ops and a per-source-file rollup.

Usage:
    python -u examples/trace_step.py [--batch 4096] [--budget_per_ray 96]
        [--impl brick3] [--union_factor 1.0] [--steps 6]
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from radnerf_tpu.losses import nerf_loss, total_loss
from radnerf_tpu.models.gates import init_ray_gate
from radnerf_tpu.models.mngp import MNGPConfig, init_mngp, init_mngp_state
from radnerf_tpu.render.ml_render import ml_render_train
from radnerf_tpu.render.render import RenderConfig
from radnerf_tpu.utils import enable_compilation_cache


def build_step(args):
    cfg = MNGPConfig(
        scale=0.5, grid_size=128, log2_T=19, n_experts=2,
        compute_dtype="bfloat16", hash_impl=args.impl,
    )
    rcfg = RenderConfig(
        samples_per_ray=192, layout="flat",
        budget_per_ray=args.budget_per_ray,
        union_budget_factor=args.union_factor,
    )
    params = init_mngp(jax.random.PRNGKey(0), cfg)
    gate_params = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
    state = init_mngp_state(cfg)
    g = cfg.grid_size
    lin = (np.arange(g) + 0.5) / g * 2 - 1
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    rr = np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale
    shell = (rr < 0.3) & (rr > 0.26)
    occ = np.broadcast_to(
        shell[None, None], (cfg.n_experts, cfg.cascades, g, g, g)
    )
    state = {**state, "occ": jnp.asarray(occ)}

    N = args.batch
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    o = jax.random.normal(k1, (N, 3))
    o = o / jnp.linalg.norm(o, axis=1, keepdims=True) * 1.2
    tgt = jax.random.uniform(k2, (N, 3), minval=-0.25, maxval=0.25)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    batch = {"rays_o": o, "rays_d": d,
             "rgb": jax.random.uniform(k3, (N, 3))}

    optimizer = optax.adam(1e-2, eps=1e-15)
    bundle = {"model": params, "gate": gate_params}
    opt_state = optimizer.init(bundle)

    def loss_fn(bundle, key):
        out = ml_render_train(
            bundle["model"], state, cfg, bundle["gate"],
            batch["rays_o"], batch["rays_d"], batch["rays_d"], key, rcfg,
        )
        return total_loss(nerf_loss(
            out, {"rgb": batch["rgb"]}, lambda_opacity=1e-3,
            lambda_cv_importance=1e-2, lambda_depth_mutual=5e-3,
        ))

    @jax.jit
    def step(bundle, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(bundle, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        bundle = optax.apply_updates(bundle, updates)
        return loss, bundle, opt_state

    return step, bundle, opt_state


def parse_xplanes(logdir, steps):
    import json

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in d["cols"]]
    ix = {k: cols.index(k) for k in (
        "category", "hlo_op_name", "tf_op_name", "total_self_time",
        "occurrences", "hlo_op_expression")}
    rows = [[c["v"] for c in r["c"]] for r in d["rows"]]
    rows.sort(key=lambda r: -r[ix["total_self_time"]])
    tot = sum(r[ix["total_self_time"]] for r in rows)
    print(f"\n== total device {tot/1000/steps:.1f} ms/step; top HLO ops ==")
    for r in rows[:40]:
        expr = (r[ix["hlo_op_expression"]] or "")[:80].replace("\n", " ")
        print(f'{r[ix["total_self_time"]]/1000/steps:7.2f} ms '
              f'x{int(r[ix["occurrences"]]):4d} '
              f'{r[ix["category"]][:16]:16s} {expr}')
    by_src = collections.Counter()
    for r in rows:
        by_src[r[ix["tf_op_name"]] or "(none)"] += r[ix["total_self_time"]]
    print("\n== by framework op path ==")
    for s, us in by_src.most_common(30):
        print(f"{us/1000/steps:8.2f} ms  {s[:140]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--budget_per_ray", type=int, default=96)
    ap.add_argument("--impl", type=str, default="brick3")
    ap.add_argument("--union_factor", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"# devices: {jax.devices()}", flush=True)
    step, bundle, opt_state = build_step(args)

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for i in range(3):
        loss, bundle, opt_state = step(bundle, opt_state, key)
    print(f"# warmup {time.time()-t0:.1f}s", flush=True)
    _ = float(loss)

    logdir = tempfile.mkdtemp(prefix="radnerf_trace_")
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for i in range(args.steps):
            loss, bundle, opt_state = step(bundle, opt_state, key)
        _ = float(loss)
    wall = time.time() - t0
    print(f"# traced {args.steps} steps in {wall:.2f}s "
          f"({wall/args.steps*1e3:.1f} ms/step wall)", flush=True)

    parse_xplanes(logdir, args.steps)


if __name__ == "__main__":
    main()
