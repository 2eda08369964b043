"""Single-field rendering (train + test).

TPU twin of `render` / `__render_rays_train` / `__render_rays_test`
(reference: models/rendering.py). Train path: AABB intersect -> lattice
march -> field eval on dense (N, S) samples -> masked compositing ->
background blend. Test path: resumable blockwise marching under
lax.while_loop with dense alive-masking (the static-shape counterpart of
the reference's alive_indices compaction, rendering.py:142-174).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from ..ops.compositing import (
    composite_test_block,
    composite_test_flat,
    composite_train,
    composite_train_flat,
)
from ..ops.intersection import scene_near_far
from ..ops.marching import (
    MarchConfig,
    march_rays_test_block,
    march_rays_test_flat,
    march_rays_train,
    march_rays_train_flat,
)
from ..models.ngp import NGPConfig, ngp_forward, scene_center_half

MAX_SAMPLES = 1024
NEAR_DISTANCE = 0.01


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render-time knobs (the kwargs of reference render())."""

    exp_step_factor: float = 0.0       # 1/256 when scale > 0.5 (train_ml.py:101-102)
    T_threshold: float = 1e-4
    samples_per_ray: int = 192         # S: per-ray occupied-sample cap
    max_samples: int = MAX_SAMPLES
    random_bg: bool = False
    test_block_samples: int = 128      # per-iteration per-ray sample cap
    test_k_block: int = 512            # lattice candidates examined per iter
    # test-time layout: "flat" compacts alive rays' samples into a
    # N*test_budget_per_ray buffer each iteration (the static budget
    # redistributes to surviving rays — see march_rays_test_flat);
    # "dense" is the (N, S) masked-lane path (render_test_compacted adds
    # host-side ray compaction on top of it)
    test_layout: str = "flat"
    # round-5 sweep on v5e at chunk 4096 (docs/PERF_NOTES.md): with the
    # brick3 encode + brick occupancy the per-iteration fixed costs
    # dominate, inverting the round-3 small-budget optimum. Joint
    # optimum (S=test_block_samples, b=budget, k=k_block): (128, 24,
    # 512) -> 60.0k rays/s; neighbors (64, 16, 512) 57.5k, (128, 16,
    # 512) 58.6k, (192, 16, 512) 58.3k, (128, 32, 512) 59.0k,
    # (128, 24, 1024) 56.6k
    test_budget_per_ray: int = 24
    layout: str = "dense"              # "dense" (N, S) | "flat" static CSR
    budget_per_ray: int = 64           # flat layout: B = N * budget_per_ray
    # MoE: march/encode the union of the K experts' samples once instead of
    # K independent renders (shared start jitter; see march_rays_union_flat)
    union_sampling: bool = True
    # Scales budget_per_ray for the UNION stream only. 0.0 = AUTO: resolve
    # to n_experts at the call site — each expert then gets at least its
    # per-expert-march budget even with fully disjoint grids, at a total
    # encode cost NEVER exceeding K independent marches (shared samples
    # dedup). 1.0 keeps the union encode as cheap as a single expert's but
    # FRONT-TRUNCATES each expert's tail as grids diverge — measured -8 dB
    # on the full-scale hard scene by step 250 (docs/CONVERGENCE.md §4);
    # only use 1.0 when an adaptive controller governs budget_per_ray
    # (the trainer's --adaptive_budget path, which grows the bucket as
    # the union saturates).
    union_budget_factor: float = 0.0

    def march(self, cfg: NGPConfig) -> MarchConfig:
        return MarchConfig(
            scale=cfg.scale,
            cascades=cfg.cascades,
            grid_size=cfg.grid_size,
            exp_step_factor=self.exp_step_factor,
            max_samples=self.max_samples,
            samples_per_ray=self.samples_per_ray,
        )


def background_color(rcfg: RenderConfig, key: jax.Array | None) -> jnp.ndarray:
    """White for synthetic scenes (exp_step_factor == 0), else black or a
    random color (rendering.py:229-235)."""
    if rcfg.exp_step_factor == 0.0:
        return jnp.ones(3)
    if rcfg.random_bg and key is not None:
        return jax.random.uniform(key, (3,))
    return jnp.zeros(3)


def render_train(
    params: dict,
    state: dict,
    cfg: NGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    rcfg: RenderConfig,
    forward_fn=None,
    noise: jnp.ndarray | None = None,
) -> dict:
    """Training-time render of a ray batch.

    `forward_fn(x, d) -> (sigmas, rgbs)` overrides the field evaluation
    (used by ensemble renderers); defaults to the NGP field.
    `noise`: optional (N,) uniform start-jitter override — the trainer
    derives it from GLOBAL ray ids so the data-parallel step is
    device-count invariant (SURVEY.md §4 host-count invariance); None
    draws from `key` (single-process semantics).
    Returns the reference's result dict on the dense layout:
    rgb (N,3), depth (N,), opacity (N,), ws/ts/deltas/valid (N,S),
    n_samples (N,), rm_samples, vr_samples, total_samples.
    """
    if forward_fn is None:
        forward_fn = lambda x, d: ngp_forward(params, state, cfg, x, d)
    N = rays_o.shape[0]
    k_noise, k_bg = jax.random.split(key)
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(rays_o, rays_d, center, half, NEAR_DISTANCE)
    mcfg = rcfg.march(cfg)
    if noise is None:
        noise = jax.random.uniform(k_noise, (N,))
    if rcfg.layout == "flat":
        return _render_train_flat(
            forward_fn, rays_o, rays_d, t1, t2, state["occ"], mcfg, rcfg,
            noise, k_bg,
        )
    m = march_rays_train(rays_o, rays_d, t1, t2, state["occ"], mcfg, noise)
    S = mcfg.samples_per_ray

    xyz = rays_o[:, None, :] + m["ts"][..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))
    fwd_out = forward_fn(xyz.reshape(-1, 3), dirs.reshape(-1, 3))
    # field closures may return per-sample extras (e.g. the switch model's
    # point-gate results, rendering.py:217-220) as an optional third item
    extras = None
    if isinstance(fwd_out, tuple) and len(fwd_out) == 3:
        sigmas, rgbs, extras = fwd_out
    else:
        sigmas, rgbs = fwd_out
    sigmas = sigmas.reshape(N, S)
    rgbs = rgbs.reshape(N, S, 3)

    out = composite_train(
        sigmas, rgbs, m["deltas"], m["ts"], m["valid"], rcfg.T_threshold
    )
    rgb_bg = background_color(rcfg, k_bg)
    out["rgb"] = out["rgb"] + rgb_bg * (1.0 - out["opacity"])[:, None]
    out.update(
        ts=m["ts"], deltas=m["deltas"], valid=m["valid"],
        n_samples=m["n_samples"],
        rm_samples=jnp.sum(m["n_samples"]),
        total_samples=jnp.sum(out["vr_samples"]),
    )
    if extras is not None:
        out["gate_results"] = extras
    return out


def _render_train_flat(
    forward_fn, rays_o, rays_d, t1, t2, occ, mcfg, rcfg, noise, k_bg
) -> dict:
    """Flat-layout training render: zero padding waste — every field
    evaluation is a real occupied sample (the TPU twin of the reference's
    compacted CSR pipeline, rendering.py:192-239)."""
    m = march_rays_train_flat(
        rays_o, rays_d, t1, t2, occ, mcfg, noise,
        budget_per_ray=rcfg.budget_per_ray,
    )
    rid = m["ray_id"]
    o = jnp.take(rays_o, rid, axis=0)
    d = jnp.take(rays_d, rid, axis=0)
    xyz = o + m["ts"][:, None] * d
    # closures that need the sample->ray mapping (e.g. block/mega per-ray
    # gating) declare a `ray_id` keyword
    import inspect

    if "ray_id" in inspect.signature(forward_fn).parameters:
        fwd_out = forward_fn(xyz, d, ray_id=rid)
    else:
        fwd_out = forward_fn(xyz, d)
    extras = None
    if isinstance(fwd_out, tuple) and len(fwd_out) == 3:
        sigmas, rgbs, extras = fwd_out
    else:
        sigmas, rgbs = fwd_out
    out = composite_train_flat(
        sigmas, rgbs, m["deltas"], m["ts"], rid, m["offsets"], m["cap"],
        m["valid"], rcfg.T_threshold,
    )
    rgb_bg = background_color(rcfg, k_bg)
    out["rgb"] = out["rgb"] + rgb_bg * (1.0 - out["opacity"])[:, None]
    out.update(
        ts=m["ts"], deltas=m["deltas"], valid=m["valid"],
        ray_id=rid, offsets=m["offsets"], cap=m["cap"],
        n_samples=m["n_samples"],
        rm_samples=m["total"],
        budget_util=m["total"].astype(jnp.float32) / m["ts"].shape[0],
        total_samples=jnp.sum(out["vr_samples"]),
    )
    if extras is not None:
        out["gate_results"] = extras
    return out


def render_test(
    params: dict,
    state: dict,
    cfg: NGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rcfg: RenderConfig,
    forward_fn=None,
    occ: jnp.ndarray | None = None,
    carry_in: dict | None = None,
    n_iters: int | None = None,
    return_carry: bool = False,
):
    """Test-time render (no grad): blockwise march + resumable compositing
    under lax.while_loop, dense alive masks instead of ray compaction.

    min_samples intentionally folded into `test_block_samples`; the
    reference's N_samples growth heuristic (rendering.py:142-147) is a
    GPU-occupancy trick — on TPU a fixed block with masked lanes behaves
    uniformly. `carry_in`/`n_iters`/`return_carry` expose phase-wise
    resumption for the host-side alive-ray compaction wrapper
    (render_test_compacted) — the TPU answer to the reference's
    alive_indices compaction (rendering.py:142-147).
    """
    if forward_fn is None:
        forward_fn = lambda x, d: ngp_forward(params, state, cfg, x, d)
    if occ is None:
        occ = state["occ"]
    if rcfg.test_layout == "flat":
        return _render_test_flat(
            params, state, cfg, rays_o, rays_d, rcfg, forward_fn, occ,
            carry_in=carry_in, n_iters=n_iters, return_carry=return_carry,
        )
    N = rays_o.shape[0]
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(rays_o, rays_d, center, half, NEAR_DISTANCE)
    mcfg = rcfg.march(cfg)
    S = rcfg.test_block_samples
    max_iters = int(math.ceil(rcfg.max_samples / S))
    if n_iters is not None:
        max_iters = min(max_iters, n_iters)

    if carry_in is None:
        init = {
            "cursor": t1,
            "acc": {
                "opacity": jnp.zeros(N),
                "depth": jnp.zeros(N),
                "rgb": jnp.zeros((N, 3)),
                "transmittance": jnp.ones(N),
                "alive": (t1 >= 0),
            },
            "i": jnp.asarray(0),
            "total_samples": jnp.asarray(0),
        }
    else:
        init = {**carry_in, "i": jnp.asarray(0)}

    def cond(carry):
        return (carry["i"] < max_iters) & jnp.any(
            carry["acc"]["alive"] & (carry["cursor"] < t2)
        )

    def body(carry):
        blk = march_rays_test_block(
            rays_o, rays_d, carry["cursor"], t2, occ, mcfg,
            n_samples=S, k_block=rcfg.test_k_block,
        )
        xyz = rays_o[:, None, :] + blk["ts"][..., None] * rays_d[:, None, :]
        dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))
        sigmas, rgbs = forward_fn(xyz.reshape(-1, 3), dirs.reshape(-1, 3))
        acc = composite_test_block(
            sigmas.reshape(N, S), rgbs.reshape(N, S, 3),
            blk["deltas"], blk["ts"], blk["valid"], carry["acc"],
            rcfg.T_threshold,
        )
        return {
            "cursor": blk["new_cursor"],
            "acc": acc,
            "i": carry["i"] + 1,
            "total_samples": carry["total_samples"]
            + jnp.sum(jnp.where(carry["acc"]["alive"], blk["n_eff"], 0)),
        }

    carry = jax.lax.while_loop(cond, body, init)
    acc = carry["acc"]
    rgb_bg = background_color(rcfg, None)
    rgb = acc["rgb"] + rgb_bg * (1.0 - acc["opacity"])[:, None]
    out = {
        "rgb": rgb,
        "depth": acc["depth"],
        "opacity": acc["opacity"],
        "total_samples": carry["total_samples"],
    }
    if return_carry:
        done = ~(acc["alive"] & (carry["cursor"] < t2))
        return out, {k: carry[k] for k in ("cursor", "acc",
                                           "total_samples")}, done
    return out


def _render_test_flat(
    params, state, cfg, rays_o, rays_d, rcfg, forward_fn, occ,
    carry_in=None, n_iters=None, return_carry=False,
) -> dict:
    """Flat test-time render: per while-loop iteration, alive rays' kept
    samples compact into ONE (N * test_budget_per_ray,) buffer, so field
    evaluations track composited samples instead of N x S x iterations —
    the in-graph answer to the reference's alive-ray compaction
    (rendering.py:142-174). Truncated rays resume via the march cursor
    (march_rays_test_flat); the static budget redistributes to survivors
    as rays retire. `carry_in`/`n_iters`/`return_carry` expose phase-wise
    resumption so render_test_compacted can shrink N itself between
    phases (flat buffer AND candidate work then track the alive count)."""
    N = rays_o.shape[0]
    center, half = scene_center_half(state)
    t1, t2 = scene_near_far(rays_o, rays_d, center, half, NEAR_DISTANCE)
    mcfg = rcfg.march(cfg)
    S = rcfg.test_block_samples
    budget = rcfg.test_budget_per_ray
    # rays retire on per-ray consumed-sample progress (samples_done, the
    # reference's per-ray MAX_SAMPLES bound); `max_iters` is only a safety
    # valve sized from the MINIMUM possible per-iteration progress — the
    # first alive unfinished ray always consumes >= 1 sample or skips
    # k_block lattice candidates, so rays finish sequentially at worst
    max_iters = min(
        N * (rcfg.max_samples
             + int(math.ceil(mcfg.k_candidates / rcfg.test_k_block))),
        2**31 - 2,
    )
    if n_iters is not None:
        max_iters = min(max_iters, n_iters)

    if carry_in is None:
        init = {
            "cursor": t1,
            "acc": {
                "opacity": jnp.zeros(N),
                "depth": jnp.zeros(N),
                "rgb": jnp.zeros((N, 3)),
                "transmittance": jnp.ones(N),
                "alive": (t1 >= 0),
            },
            "samples_done": jnp.zeros((N,), jnp.int32),
            "i": jnp.asarray(0),
            "total_samples": jnp.asarray(0),
        }
    else:
        init = {**carry_in, "i": jnp.asarray(0)}

    def cond(carry):
        return (carry["i"] < max_iters) & jnp.any(
            carry["acc"]["alive"] & (carry["cursor"] < t2)
        )

    def body(carry):
        m = march_rays_test_flat(
            rays_o, rays_d, carry["cursor"], t2, occ, mcfg,
            carry["acc"]["alive"], k_block=rcfg.test_k_block,
            cap_per_ray=S, budget_per_ray=budget,
        )
        rid = m["ray_id"]
        o = jnp.take(rays_o, rid, axis=0)
        d = jnp.take(rays_d, rid, axis=0)
        xyz = o + m["ts"][:, None] * d
        fwd_out = forward_fn(xyz, d)
        sigmas, rgbs = fwd_out[0], fwd_out[1]
        acc = composite_test_flat(
            sigmas, rgbs, m["deltas"], m["ts"], rid, m["offsets"],
            m["cap"], m["valid"], carry["acc"], rcfg.T_threshold,
        )
        samples_done = carry["samples_done"] + m["consumed"]
        acc["alive"] = acc["alive"] & (samples_done < rcfg.max_samples)
        return {
            "cursor": m["new_cursor"],
            "acc": acc,
            "samples_done": samples_done,
            "i": carry["i"] + 1,
            "total_samples": carry["total_samples"]
            + jnp.sum(m["consumed"]),
        }

    carry = jax.lax.while_loop(cond, body, init)
    acc = carry["acc"]
    rgb_bg = background_color(rcfg, None)
    rgb = acc["rgb"] + rgb_bg * (1.0 - acc["opacity"])[:, None]
    out = {
        "rgb": rgb,
        "depth": acc["depth"],
        "opacity": acc["opacity"],
        "total_samples": carry["total_samples"],
    }
    if return_carry:
        done = ~(acc["alive"] & (carry["cursor"] < t2))
        return out, {k: carry[k] for k in ("cursor", "acc", "samples_done",
                                           "total_samples")}, done
    return out


@functools.lru_cache(maxsize=None)
def _compacted_phase(cfg: NGPConfig, rcfg: RenderConfig, phase_iters: int):
    """Jitted phase runner for render_test_compacted (default field path);
    cached across validate calls, one compile per ray-bucket shape."""

    @jax.jit
    def phase(params, state, ro, rd, carry):
        return render_test(
            params, state, cfg, ro, rd, rcfg, carry_in=carry,
            n_iters=phase_iters, return_carry=True,
        )

    return phase


def render_test_compacted(
    params: dict,
    state: dict,
    cfg: NGPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rcfg: RenderConfig,
    forward_fn=None,
    occ: jnp.ndarray | None = None,
    phase_iters: int = 4,
) -> dict:
    """render_test with HOST-SIDE alive-ray compaction between phases.

    Retired rays in the while_loop burn full field-eval cost in dead
    lanes (VERDICT round-2 weak #5). This wrapper runs `phase_iters`
    loop iterations at a time; after each phase the still-alive rays are
    gathered into the next power-of-two bucket (static shapes -> at most
    log2(N) compiled variants, cached). The per-ray math is identical to
    render_test — compaction only changes which lanes carry dead rays.
    Host sync per phase costs ~ms; at validation resolutions the saved
    field evaluations dominate (reference analogue: alive_indices
    compaction, rendering.py:142-174)."""
    import numpy as np

    if forward_fn is None and occ is None:
        phase_fn = _compacted_phase(cfg, rcfg, phase_iters)
    else:
        # custom field closure: per-call jit (tests / ensemble members)
        phase_fn = jax.jit(
            lambda p, s, ro, rd, c: render_test(
                p, s, cfg, ro, rd, rcfg, forward_fn=forward_fn, occ=occ,
                carry_in=c, n_iters=phase_iters, return_carry=True,
            )
        )

    N = rays_o.shape[0]
    S = rcfg.test_block_samples
    if rcfg.test_layout == "flat":
        # the flat inner loop guarantees only `test_budget_per_ray`
        # samples of progress per alive ray per iteration (less under
        # buffer contention; the while cond retires rays as they finish,
        # so phases after the typical few are no-ops) — safety cap only
        total_phases = int(math.ceil(
            (rcfg.max_samples / max(rcfg.test_budget_per_ray, 1) + 8)
            / phase_iters)) * 8
    else:
        total_phases = int(math.ceil(math.ceil(rcfg.max_samples / S)
                                     / phase_iters))
    out_np = {
        "rgb": np.zeros((N, 3), np.float32),
        "depth": np.zeros((N,), np.float32),
        "opacity": np.zeros((N,), np.float32),
    }
    total_samples = 0
    idx = np.arange(N)
    carry = None
    # index N selects a ray that misses the scene box: pad lanes are dead
    # from birth (no field evals, no sample counts). Rays stay ON DEVICE —
    # only the small done-mask and per-phase outputs cross the host (the
    # axon tunnel makes bulk host round-trips ~2 s / 25 MB). The miss ray
    # starts past the box's +x face pointing +x so it misses at ANY scene
    # scale (a fixed origin would sit inside boxes with half-extent >= 4).
    center, half = scene_center_half(state)
    miss_x = float(center[0] + 2.0 * float(jnp.max(half)) + 1.0)
    miss_o = jnp.asarray([[miss_x, 0.0, 0.0]], jnp.float32)
    miss_d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    ro_ext = jnp.concatenate([jnp.asarray(rays_o), miss_o], axis=0)
    rd_ext = jnp.concatenate([jnp.asarray(rays_d), miss_d], axis=0)
    # Run until no rays are alive. total_phases is the expected bound;
    # the hard cap only guards against a pathological non-terminating
    # march (e.g. a cursor bug) — hitting it is a bug, and silently
    # returning partially-composited rays would hide it, so warn loudly.
    phases_run = 0
    hard_cap = max(4 * total_phases, 64)
    while phases_run < hard_cap:
        phases_run += 1
        n = len(idx)
        bucket = max(128, 1 << (n - 1).bit_length())
        pad = bucket - n
        sel_np = np.concatenate([idx, np.full(pad, N)]) if pad else idx
        sel = jnp.asarray(sel_np, jnp.int32)
        ro = jnp.take(ro_ext, sel, axis=0)
        rd = jnp.take(rd_ext, sel, axis=0)
        out, carry2, done = phase_fn(params, state, ro, rd, carry)
        done_np = np.array(done)   # small (bucket,) transfer
        if pad:
            done_np[n:] = True
        total_samples += int(out["total_samples"])
        for k in out_np:
            out_np[k][idx] = np.asarray(out[k])[:n]
        alive = ~done_np[:n]
        if not alive.any():
            carry = None
            idx = idx[:0]
            break
        keep = np.nonzero(alive)[0]
        idx = idx[keep]
        # gather the carry down to the surviving rays ON DEVICE (padded to
        # the next phase's bucket; MUST use the loop head's formula)
        n2 = len(keep)
        bucket2 = max(128, 1 << (n2 - 1).bit_length())
        pad2 = bucket2 - n2
        ksel = jnp.asarray(
            np.concatenate([keep, np.full(pad2, keep[-1])]) if pad2
            else keep,
            jnp.int32,
        )
        # pad lanes must not march again into a real ray's accumulators:
        # their alive flag is forced False device-side
        lane_real = jnp.asarray(
            np.arange(bucket2) < n2 if pad2 else np.ones(bucket2, bool)
        )
        gather = lambda x: jnp.take(x, ksel, axis=0)
        acc = jax.tree_util.tree_map(gather, carry2["acc"])
        acc["alive"] = acc["alive"] & lane_real
        carry = {"acc": acc,
                 "total_samples": jnp.asarray(0)}   # per-phase counting
        for k in carry2:
            if k not in carry:                 # cursor, samples_done, ...
                carry[k] = gather(carry2[k])
    if len(idx) > 0:
        import warnings

        warnings.warn(
            f"render_test_compacted: phase hard cap ({hard_cap}) "
            f"exhausted with {len(idx)} rays still alive; their output "
            "is partially composited (march did not terminate — this "
            "indicates a cursor/budget bug)",
            RuntimeWarning,
        )
    return {
        **{k: jnp.asarray(v) for k, v in out_np.items()},
        "total_samples": jnp.asarray(total_samples),
    }
