"""Checkpoint save/load/slim.

Twin of utils/util.py:8-43: full checkpoints carry {params, opt_state,
model state (density grids), step, hparams}; `slim_ckpt` strips everything
but params (+ optionally poses) for distribution; `load_ckpt` supports
partial, prefix-scoped warm starts (--weight_path).

Two on-disk formats, transparently distinguished by `load_ckpt`:
  - single-file pickle (the portable default; slim exports always use it);
  - an orbax PyTree checkpoint DIRECTORY written by `OrbaxAsyncWriter`
    (--ckpt_backend orbax): the device->host copy is synchronous but
    (de)serialization runs in orbax's background thread, so training never
    blocks on disk — the TPU-native answer to PL's ModelCheckpoint
    (train.py:296-301) for large hash tables. hparams (a plain dict of
    Python values) ride in a pickle sidecar inside the directory.
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
    """Save a single-file pickle checkpoint. `payload` typically contains
    params / gate_params / opt_state / model_state / step / hparams."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)


class OrbaxAsyncWriter:
    """Async checkpoint writer over orbax (one in-flight save at a time).

    save() returns as soon as arrays are copied to host; call
    wait_until_finished() (or rely on the next save / interpreter exit)
    before reading the checkpoint back."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ck = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, path: str, payload: dict) -> None:
        payload = dict(payload)
        hparams = payload.pop("hparams", None)
        self._ck.save(
            os.path.abspath(path), _to_numpy(payload), force=True
        )
        # sidecar lives NEXT TO the directory: orbax materializes `path`
        # itself by an atomic rename when the background write commits
        if hparams is not None:
            with open(path + ".hparams.pkl", "wb") as f:
                pickle.dump(hparams, f, protocol=4)

    def wait_until_finished(self) -> None:
        self._ck.wait_until_finished()

    def close(self) -> None:
        self._ck.close()


def load_ckpt(path: str) -> dict:
    """Load either format (orbax checkpoints are directories)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        out = dict(
            ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        )
        sidecar = path + ".hparams.pkl"
        if os.path.exists(sidecar):
            with open(sidecar, "rb") as f:
                out["hparams"] = pickle.load(f)
        return out
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
