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
    """Save a single-file pickle checkpoint ATOMICALLY (tmp file +
    os.replace): a kill/preemption mid-write can never leave a torn
    checkpoint at `path`, so --resume auto may trust any file it finds.
    `payload` typically contains params / gate_params / opt_state /
    model_state / step / hparams."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


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


def restructure_like(template: Any, restored: Any) -> Any:
    """Rebuild `restored` with `template`'s container types and child order.

    Orbax restores (without an item template) tuple/NamedTuple nodes — such
    as optax opt_state — as plain dicts keyed by STRINGIFIED indices; a
    naive flatten/unflatten then sorts those keys lexicographically, which
    misorders tuples with >= 10 children. This walks the live template and
    re-attaches restored children by integer index, preserving container
    types (incl. NamedTuples) and leaf order exactly. Values always come
    from `restored`; raises KeyError/IndexError on structural mismatch."""
    if isinstance(template, dict) and isinstance(restored, dict):
        return {
            k: restructure_like(template[k], restored[k]) for k in template
        }
    if isinstance(template, (tuple, list)):
        if isinstance(restored, dict):        # orbax stringified indices
            children = [
                restructure_like(template[i], restored[str(i)])
                for i in range(len(template))
            ]
        elif isinstance(restored, (tuple, list)):
            if len(restored) != len(template):
                raise IndexError("restored arity != template arity")
            children = [
                restructure_like(t, r) for t, r in zip(template, restored)
            ]
        else:                                  # leaf vs container mismatch
            raise KeyError("restored leaf where template has a container")
        if hasattr(template, "_fields"):       # NamedTuple
            return type(template)(*children)
        return type(template)(children)
    return restored


def load_ckpt(path: str, template: Any | None = None) -> dict:
    """Load either format (orbax checkpoints are directories).

    `template`: an optional pytree (e.g. the live {params, opt_state, ...}
    payload) whose container structure is re-imposed on the restored tree
    via `restructure_like` — required for orbax checkpoints that contain
    tuple/NamedTuple nodes (optax opt_state). Keys present in only one of
    template/checkpoint pass through untouched. Ignored for the pickle
    format (pickle preserves structure natively)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        out = dict(
            ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        )
        if template is not None:
            for k in out:
                if k in template:
                    try:
                        out[k] = restructure_like(template[k], out[k])
                    except (KeyError, IndexError):
                        pass   # structural mismatch: caller decides

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
