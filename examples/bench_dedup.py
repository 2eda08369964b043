"""On-TPU diagnosis of the dedup hash encode vs the windowed baseline.

Times (fw, fw+bw) for 'window' vs 'dedup' on ray-ordered samples shaped
like the bench.py stream, and reports per-level-group run counts vs caps
(overflow frequency) so cap tuning is data-driven.

Run:  timeout 900 python -u examples/bench_dedup.py
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from radnerf_tpu.ops.hashgrid import HashGridConfig  # noqa: E402
from radnerf_tpu.ops.hashgrid_dedup import (  # noqa: E402
    BLOCK,
    _group_levels,
    _group_geometry,
    _level_consts,
    _prep_blocks,
    _run_structure,
    hashgrid_encode_dedup,
    level_caps,
)
from radnerf_tpu.ops.hashgrid import init_hashgrid_table  # noqa: E402
from radnerf_tpu.ops.hashgrid_window import (  # noqa: E402
    hashgrid_encode_window,
)
from radnerf_tpu.utils import enable_compilation_cache  # noqa: E402


def ray_stream(n_rays, per_ray, seed=0, mode="contiguous", n_segments=3):
    """Samples like march_rays_union_flat output.

    mode 'contiguous': each ray's occupied samples form a few contiguous
    lattice segments (what a real occupancy grid produces — inside an
    occupied region every lattice point is kept). mode 'scattered':
    adversarial — random lattice points across the whole ray (what a
    near-converged surface-only grid at low budget approaches)."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
    tgt = rng.uniform(-0.25, 0.25, (n_rays, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dt = np.sqrt(3.0) / 1024
    span = int(1.0 / dt)
    if mode == "scattered":
        ks = np.sort(
            rng.choice(span, size=(n_rays, per_ray), replace=True), axis=1
        )
    else:
        seg_len = per_ray // n_segments
        starts = np.sort(
            rng.integers(0, span - seg_len, (n_rays, n_segments)), axis=1
        )
        ks = (
            starts[:, :, None] + np.arange(seg_len)[None, None, :]
        ).reshape(n_rays, -1)
        ks = np.pad(
            ks, ((0, 0), (0, per_ray - ks.shape[1])), mode="edge"
        )
    t = 0.7 + ks * dt
    x = o[:, None, :] + t[..., None] * d[:, None, :]
    x = 0.5 + x  # center box [-.5,.5] -> [0,1]
    return jnp.asarray(
        np.clip(x.reshape(-1, 3), 0.0, 1.0).astype(np.float32)
    )


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / iters, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=2048)
    ap.add_argument("--per_ray", type=int, default=48)
    ap.add_argument("--log2_T", type=int, default=19)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", type=str, default="contiguous",
                    choices=["contiguous", "scattered"])
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    cfg = HashGridConfig.for_scene_scale(0.5)
    cfg = HashGridConfig(
        n_levels=cfg.n_levels, n_features=2,
        log2_table_size=args.log2_T,
        base_resolution=cfg.base_resolution,
        per_level_scale=cfg.per_level_scale,
    )
    table = init_hashgrid_table(jax.random.PRNGKey(0), cfg)
    x = ray_stream(args.n_rays, args.per_ray, mode=args.mode)
    N = x.shape[0]
    print(f"# stream: {N} samples, {N*cfg.n_levels*8/1e6:.1f}M corner "
          f"issues undeduped", file=sys.stderr)

    # ---- run-count stats vs caps (on real geometry) -------------------
    caps = level_caps(cfg)
    groups, plain = _group_levels(caps, BLOCK)
    xb, _, _ = _prep_blocks(x, BLOCK)

    @jax.jit
    def stats():
        rows = []
        for levels, U in groups:
            scales, res, dense, lvl = _level_consts(cfg, levels)
            pos_i, _ = _group_geometry(xb, scales, res)
            _, _, nruns = _run_structure(pos_i)   # (G, R)
            rows.append((jnp.mean(nruns.astype(jnp.float32), axis=1),
                         jnp.max(nruns, axis=1),
                         jnp.mean((nruns > U).any(axis=1).astype(
                             jnp.float32))))
        return rows

    res_list = cfg.level_resolutions()
    for (levels, U), (mean_r, max_r, _) in zip(groups, stats()):
        for gi, lvl in enumerate(levels):
            print(f"# level {lvl:2d} res {res_list[lvl]:5d} cap {U:3d}  "
                  f"mean_runs {float(mean_r[gi]):6.1f}  "
                  f"max_runs {int(max_r[gi]):4d}  "
                  f"overflow {'YES' if int(max_r[gi]) > U else 'no'}",
                  file=sys.stderr)
    print(f"# plain levels (no dedup): {plain}", file=sys.stderr)

    # ---- timings ------------------------------------------------------
    def fw_window(t):
        return hashgrid_encode_window(t, x, cfg, jnp.bfloat16)

    def fw_dedup(t):
        return hashgrid_encode_dedup(t, x, cfg, jnp.bfloat16)

    def fwbw(fw):
        def f(t):
            return jax.value_and_grad(
                lambda tt: jnp.sum(
                    fw(tt).astype(jnp.float32) ** 2
                )
            )(t)
        return f

    def fw_dedup_dgrad(t):
        return hashgrid_encode_dedup(
            t, x, cfg, jnp.bfloat16, grad_impl="dedup"
        )

    for name, fn in (
        ("window fw  ", jax.jit(fw_window)),
        ("dedup  fw  ", jax.jit(fw_dedup)),
        ("window fwbw", jax.jit(fwbw(fw_window))),
        ("hybrid fwbw", jax.jit(fwbw(fw_dedup))),
        ("dgrad  fwbw", jax.jit(fwbw(fw_dedup_dgrad))),
    ):
        dt, s = timeit(fn, table, iters=args.iters)
        print(f"{name}: {dt*1e3:8.2f} ms   ({N*cfg.n_levels*8/dt/1e6:7.1f}"
              f" M undeduped-issues/s)  check={s:.4g}")


if __name__ == "__main__":
    main()
