"""Decompose the bench.py training step into component timings on the TPU.

Times, at the exact bench shapes (MNGP zoo=2, batch 2048, flat budget 48):
  - the full train step (fw+bw+adam)        [= bench.py's step]
  - render forward only
  - union march alone
  - hash encode fw / fw+bw alone on a B-sample stream, per impl
  - geo+rgb MLPs alone
  - a train step with the hash encode replaced by a zeros stub
    ("everything else": march + MLPs + composite + losses + adam)

Usage: python -u examples/profile_step.py [--batch 2048] [--impl dedup]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from radnerf_tpu.losses import nerf_loss, total_loss
from radnerf_tpu.models.gates import init_ray_gate
from radnerf_tpu.models.mngp import MNGPConfig, init_mngp, init_mngp_state
from radnerf_tpu.render.ml_render import ml_render_train
from radnerf_tpu.render.render import RenderConfig
from radnerf_tpu.utils import enable_compilation_cache


def timeit(f, *a, warmup=2, iters=16):
    # Sync ONCE after `iters` dispatches: successive calls pipeline through
    # the axon tunnel, so the per-call tunnel latency (~15 ms) amortizes
    # instead of inflating every sample (bench.py's protocol).
    for _ in range(warmup):
        out = f(*a)
    _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    _ = float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--budget_per_ray", type=int, default=48)
    ap.add_argument("--impl", type=str, default="dedup")
    ap.add_argument("--union_factor", type=float, default=1.0)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"# devices: {jax.devices()}", flush=True)

    cfg = MNGPConfig(
        scale=0.5, grid_size=128, log2_T=19, n_experts=2,
        compute_dtype="bfloat16", hash_impl=args.impl,
    )
    rcfg = RenderConfig(
        samples_per_ray=192, layout="flat",
        budget_per_ray=args.budget_per_ray,
        # mirror bench.py's adaptive-budget semantics: the adopted bucket
        # governs the union stream directly (factor 1.0), not the
        # quality-safe auto-K doubling applied to fixed budgets
        union_budget_factor=args.union_factor,
    )
    params = init_mngp(jax.random.PRNGKey(0), cfg)
    gate_params = init_ray_gate(jax.random.PRNGKey(1), cfg.n_experts)
    state = init_mngp_state(cfg)
    g = 128
    lin = (np.arange(g) + 0.5) / g * 2 - 1
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    # shell occupancy, matching bench.py (converged grids are shell-like)
    rr = np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale
    sphere = (rr < 0.3) & (rr > 0.26)
    occ = np.broadcast_to(
        sphere[None, None], (cfg.n_experts, cfg.cascades, g, g, g)
    )
    state = {**state, "occ": jnp.asarray(occ)}

    N = args.batch
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
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
        # returns the updated bundle: a loss-only return lets XLA dead-code
        # the entire backward pass (docs/PERF_NOTES.md gotcha)
        loss, grads = jax.value_and_grad(loss_fn)(bundle, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        bundle = optax.apply_updates(bundle, updates)
        return loss, bundle, opt_state

    key = jax.random.PRNGKey(7)
    print(f"full step          {timeit(step, bundle, opt_state, key)*1e3:9.2f} ms",
          flush=True)

    @jax.jit
    def grads_only(bundle, key):
        loss, grads = jax.value_and_grad(loss_fn)(bundle, key)
        return loss, grads

    print(f"fw+bw (no adam)    {timeit(grads_only, bundle, key)*1e3:9.2f} ms",
          flush=True)

    def loss_fn_sg_table(b, key):
        b2 = {
            "model": {**b["model"],
                      "hash_table": jax.lax.stop_gradient(
                          b["model"]["hash_table"])},
            "gate": b["gate"],
        }
        return loss_fn(b2, key)

    @jax.jit
    def grads_sg_table(bundle, key):
        loss, grads = jax.value_and_grad(loss_fn_sg_table)(bundle, key)
        return loss, grads

    print(f"fw+bw, table sg    {timeit(grads_sg_table, bundle, key)*1e3:9.2f} ms",
          flush=True)

    def loss_fn_sg_model(b, key):
        b2 = {"model": jax.lax.stop_gradient(b["model"]), "gate": b["gate"]}
        return loss_fn(b2, key)

    @jax.jit
    def grads_sg_model(bundle, key):
        loss, grads = jax.value_and_grad(loss_fn_sg_model)(bundle, key)
        return loss, grads

    print(f"fw+bw, model sg    {timeit(grads_sg_model, bundle, key)*1e3:9.2f} ms",
          flush=True)

    # --- composite fw+bw standalone at stream shapes -------------------
    from radnerf_tpu.ops.compositing import composite_train_flat

    B = args.batch * args.budget_per_ray
    kk = jax.random.PRNGKey(9)
    sig = jax.random.uniform(kk, (2, B)) * 5
    rgbv = jax.random.uniform(kk, (2, B, 3))
    delt = jnp.full((B,), 1.7e-3)
    tss = jnp.cumsum(jnp.full((B,), 1.7e-3))
    rid_c = jnp.repeat(
        jnp.arange(args.batch, dtype=jnp.int32), args.budget_per_ray
    )
    offs = jnp.arange(args.batch, dtype=jnp.int32) * args.budget_per_ray
    capc = jnp.full((args.batch,), args.budget_per_ray, jnp.int32)
    validc = jnp.ones((2, B), bool)

    @jax.jit
    def comp_fwbw(sig, rgbv):
        def f(s, r):
            out = jax.vmap(
                lambda sk, rk, vk: composite_train_flat(
                    sk, rk, delt, tss, rid_c, offs, capc, vk, 1e-4
                )
            )(s, r, validc)
            return (
                jnp.sum(out["rgb"]) + jnp.sum(out["opacity"])
                + jnp.sum(out["depth"]) + jnp.sum(out["ws"])
            )

        l, g = jax.value_and_grad(f, argnums=(0, 1))(sig, rgbv)
        return l, g

    print(f"composite fw+bw    {timeit(comp_fwbw, sig, rgbv)*1e3:9.2f} ms",
          flush=True)

    fwd = jax.jit(lambda b, k: loss_fn(b, k))
    print(f"render fw only     {timeit(fwd, bundle, key)*1e3:9.2f} ms",
          flush=True)

    # --- march alone -------------------------------------------------
    from radnerf_tpu.ops.intersection import scene_near_far
    from radnerf_tpu.models.ngp import scene_center_half
    from radnerf_tpu.ops.marching import march_rays_union_flat

    mcfg = rcfg.march(cfg)
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(o, d, center, half, 0.01)
    noise = jax.random.uniform(jax.random.PRNGKey(3), (N,))

    @jax.jit
    def march_only(o, d, t1, t2, occ, noise):
        m, member = march_rays_union_flat(
            o, d, t1, t2, occ, mcfg, noise,
            budget_per_ray=args.budget_per_ray, cap_scale=cfg.n_experts,
        )
        return m["ts"].sum() + member.sum()

    print(f"union march        {timeit(march_only, o, d, t1, t2, state['occ'], noise)*1e3:9.2f} ms",
          flush=True)

    # --- encode alone on the B stream --------------------------------
    bp = args.budget_per_ray
    B = N * bp
    xs_ray = jnp.repeat(o[: B // bp], bp, axis=0)[:B]  # ray-coherent-ish
    ts = jnp.tile(jnp.linspace(0.7, 1.3, bp), B // bp)[:B]
    xpts = jnp.clip(
        (xs_ray + ts[:, None] * jnp.repeat(d[: B // bp], bp, axis=0)[:B])
        * 0.5 + 0.5, 0.0, 1.0,
    )
    from radnerf_tpu.ops.hashgrid import encode_dispatch

    table = params["hash_table"]
    hcfg = cfg.hash

    for impl in (args.impl, "slab"):
        enc = jax.jit(
            lambda t, x, impl=impl: jnp.sum(
                encode_dispatch(t, x, hcfg, jnp.bfloat16, impl)
                .astype(jnp.float32)
            )
        )
        try:
            dt = timeit(enc, table, xpts)
            print(f"encode fw [{impl:6s}] {dt*1e3:9.2f} ms", flush=True)
        except Exception as e:
            print(f"encode fw [{impl}] FAILED: {type(e).__name__}: {e}",
                  flush=True)
        encg = jax.jit(
            jax.grad(
                lambda t, x, impl=impl: jnp.sum(
                    encode_dispatch(t, x, hcfg, jnp.bfloat16, impl)
                    .astype(jnp.float32)
                )
            )
        )
        try:
            dt = timeit(lambda t, x: jnp.sum(encg(t, x)[0, 0]), table, xpts)
            print(f"encode fwbw [{impl:6s}] {dt*1e3:9.2f} ms", flush=True)
        except Exception as e:
            print(f"encode fwbw [{impl}] FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # --- MLPs alone ---------------------------------------------------
    from radnerf_tpu.models.mlp import apply_mlp

    feat = jnp.zeros((B, 32), jnp.bfloat16)
    dirs = jnp.zeros((B, 16), jnp.bfloat16)

    @jax.jit
    def mlps(p, feat, dirs):
        h = jax.vmap(
            lambda pp: apply_mlp(pp, feat, compute_dtype=cfg.cdtype)
        )(p["geo"])
        rgb_in = jnp.concatenate(
            [jnp.broadcast_to(dirs[None], (2,) + dirs.shape), h[..., 1:]],
            axis=-1,
        )
        r = jax.vmap(
            lambda pp, f: apply_mlp(pp, f, out_act="sigmoid",
                                    compute_dtype=cfg.cdtype)
        )(p["rgb"], rgb_in)
        return jnp.sum(r.astype(jnp.float32)) + jnp.sum(
            h.astype(jnp.float32)
        )

    print(f"geo+rgb MLPs       {timeit(mlps, params, feat, dirs)*1e3:9.2f} ms",
          flush=True)

    # --- step with encode stubbed out --------------------------------
    import radnerf_tpu.models.mngp as mngp_mod

    real_encode = mngp_mod._encode
    try:
        mngp_mod._encode = lambda p, s, c, x, impl=None: jnp.zeros(
            (x.shape[0], c.hash.out_dim), jnp.bfloat16
        ) + p["hash_table"][0, 0, 0].astype(jnp.bfloat16)

        @jax.jit
        def step_stub(bundle, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(bundle, key)
            updates, opt_state = optimizer.update(grads, opt_state)
            return loss

        print(f"step, encode stub  {timeit(step_stub, bundle, opt_state, key)*1e3:9.2f} ms",
              flush=True)
    finally:
        mngp_mod._encode = real_encode


if __name__ == "__main__":
    main()
