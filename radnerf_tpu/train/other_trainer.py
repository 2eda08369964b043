"""Trainer for the block/mega/switch multi-submodel baselines.

The reference's `train_other.py` was deliberately gitignored and never
shipped, though 14 scripts reference it (SURVEY.md §8 quirk 6). This is a
reconstruction from the surviving model/render files and the script flag
matrices (--model_type {switch, block, mega}, --gate_type point,
--overlap_ratio):

- switch: point-gated shared field (switch_NGP) — gate learned end-to-end,
  cv loss on the gate load.
- block/mega: shared field + per-submodel rgb heads with an EXTERNAL
  spatial gating code. Reconstruction: k-means over camera positions
  assigns each training camera to a submodel; per-ray gating is a softmax
  over negative squared distances with temperature set by --overlap_ratio
  (0 -> hard one-hot, larger -> softer overlap), normalized per-ray.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import nerf_loss, total_loss
from ..metrics import psnr as psnr_fn
from ..models.block import (
    BlockNGPConfig,
    init_block_ngp,
    init_block_ngp_state,
)
from ..models.ngp import update_density_grid
from ..models.switch import (
    SwitchNGPConfig,
    init_switch_ngp,
    init_switch_ngp_state,
    switch_density,
)
from ..render.block_render import block_render_test, block_render_train
from ..render.switch_render import switch_render_test, switch_render_train
from .trainer import DENSITY_THRESHOLD, NeRFSystem, jnp_get_rays


def kmeans_cameras(positions: np.ndarray, k: int, iters: int = 50,
                   seed: int = 0) -> np.ndarray:
    """Tiny k-means over camera centers -> (k, 3) submodel anchors."""
    rng = np.random.default_rng(seed)
    centers = positions[rng.choice(len(positions), k, replace=False)]
    for _ in range(iters):
        d = ((positions[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            pts = positions[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return centers


class OtherNeRFSystem(NeRFSystem):
    """`--model_type {switch, block, mega}` training system."""

    def __init__(self, hparams):
        hparams.moe_training = False
        super().__init__(hparams)
        self.kind = hparams.model_type
        if self.kind == "switch":
            self.cfg = SwitchNGPConfig(
                scale=hparams.scale, log2_T=hparams.hash_table_size,
                n_experts=hparams.model_zoo_size,
                compute_dtype=getattr(hparams, "compute_dtype", "bfloat16"),
            )
        else:
            self.cfg = BlockNGPConfig(
                scale=hparams.scale, log2_T=hparams.hash_table_size,
                n_experts=hparams.model_zoo_size,
                compute_dtype=getattr(hparams, "compute_dtype", "bfloat16"),
            )

    def configure_model(self):
        self.key, k1 = jax.random.split(self.key)
        if self.kind == "switch":
            self.params = init_switch_ngp(k1, self.cfg)
            self.model_state = init_switch_ngp_state(self.cfg)
        else:
            self.params = init_block_ngp(k1, self.cfg)
            self.model_state = init_block_ngp_state(self.cfg)
        self.gate_params = None
        # spatial anchors for block/mega external gating
        if self.kind in ("block", "mega"):
            cams = np.asarray(self.train_dataset.poses[..., 3])
            self.anchors = jnp.asarray(
                kmeans_cameras(cams.copy(), self.cfg.n_experts)
            )

    def spatial_gating(self, rays_o: jnp.ndarray) -> jnp.ndarray:
        """(N, K) spatial gate from distance to submodel anchors."""
        d2 = jnp.sum(
            (rays_o[:, None, :] - self.anchors[None]) ** 2, axis=-1
        )
        tau = max(float(self.h.overlap_ratio), 1e-6)
        return jax.nn.softmax(-d2 / tau, axis=1)

    def build_steps(self):
        h = self.h
        cfg, rcfg = self.cfg, self.rcfg
        kind = self.kind
        from ..parallel import make_train_step

        def loss_fn(bundle, model_state, batch, data, key):
            params = bundle["model"]
            k_render = key
            poses = data["poses"][batch["img_idxs"]]
            directions = data["directions"][batch["pix_idxs"]]
            rays_o, rays_d = jnp_get_rays(directions, poses)
            target = {
                "rgb": data["rays"][batch["img_idxs"], batch["pix_idxs"]][
                    :, :3
                ]
            }
            if kind == "switch":
                out = switch_render_train(
                    params, model_state, cfg, rays_o, rays_d, k_render, rcfg
                )
                out["gating_importance"] = out["gating_importance"].astype(
                    jnp.float32
                )
                ld = nerf_loss(
                    out, target,
                    lambda_opacity=h.opacity_loss_w,
                    lambda_cv_importance=h.cv_loss_w,
                )
            else:
                gate = self.spatial_gating(rays_o)
                out = block_render_train(
                    params, model_state, cfg, rays_o, rays_d, gate,
                    k_render, rcfg,
                )
                ld = nerf_loss(
                    out, target, lambda_opacity=h.opacity_loss_w,
                )
            loss = total_loss(ld)
            aux = {
                "psnr": psnr_fn(out["rgb"], target["rgb"]),
                "rm_samples": out["rm_samples"].astype(jnp.float32),
            }
            return loss, aux

        self.train_step = make_train_step(loss_fn, self.optimizer, self.mesh)

        if kind == "switch":
            density_fn = lambda p, s: (
                lambda x: switch_density(p, s, cfg, x)
            )
        else:
            from ..models.block import block_density

            density_fn = lambda p, s: (lambda x: block_density(p, s, cfg, x))

        self._grid_update = jax.jit(
            lambda p, s, k, warmup: update_density_grid(
                p, s, cfg, k, DENSITY_THRESHOLD, warmup,
                density_fn=density_fn(p, s),
            ),
            static_argnames="warmup",
        )

        def render_chunk(bundle, model_state, rays_o, rays_d, imgs_d):
            params = bundle["model"]
            if kind == "switch":
                return switch_render_test(
                    params, model_state, cfg, rays_o, rays_d, rcfg
                )
            gate = self.spatial_gating(rays_o)
            return block_render_test(
                params, model_state, cfg, rays_o, rays_d, gate, rcfg
            )

        self.render_chunk = jax.jit(render_chunk)
