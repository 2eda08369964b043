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


def parse_xplanes(logdir):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = collections.Counter()          # (op_display) -> ps
    src = {}
    total_ps = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            if "SparseCore" in plane.name:
                continue
            emeta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry per-HLO events; skip step/annotation
                if "xla op" not in lname and "ops" != lname:
                    continue
                for ev in line.events:
                    md = emeta[ev.metadata_id]
                    name = md.name
                    agg[name] += ev.duration_ps
                    total_ps += ev.duration_ps
                    if name not in src:
                        for st in list(md.stats):
                            sm = stat_meta[st.metadata_id].name
                            if sm in ("source", "source_info",
                                      "tf_op", "source_stack"):
                                src[name] = (
                                    st.str_value
                                    or stat_meta[st.ref_value].name
                                )
                                break
    return agg, src, total_ps


def rollup(agg, src, total_ps, steps):
    # per-op table
    print(f"\n== top HLO ops (total device {total_ps/1e12*1000:.1f} ms "
          f"over {steps} steps; per-step ms shown) ==")
    for name, ps in agg.most_common(45):
        s = src.get(name, "")
        print(f"{ps/1e12*1000/steps:8.3f} ms  {name[:72]:72s} {s[:60]}")
    # source-file rollup
    by_file = collections.Counter()
    for name, ps in agg.items():
        s = src.get(name, "")
        m = re.search(r"([\w_/]+\.py):?(\d+)?", s)
        key = m.group(1).split("/")[-1] if m else "(no source)"
        by_file[key] += ps
    print("\n== per-source-file rollup (per-step ms) ==")
    for f, ps in by_file.most_common(25):
        print(f"{ps/1e12*1000/steps:8.3f} ms  {f}")


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

    agg, src, total_ps = parse_xplanes(logdir)
    if not agg:
        print("no device events parsed; planes present:", flush=True)
        from tensorflow.core.profiler.protobuf import xplane_pb2
        for p in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                           recursive=True):
            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(p, "rb").read())
            for plane in xs.planes:
                print("  plane:", plane.name,
                      "lines:", [ln.name for ln in plane.lines][:8])
        return
    rollup(agg, src, total_ps, args.steps)


if __name__ == "__main__":
    main()
