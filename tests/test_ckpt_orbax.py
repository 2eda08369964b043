"""Orbax async checkpoint backend: roundtrip + format transparency.

`save_ckpt` (pickle file) and `OrbaxAsyncWriter` (orbax directory) must be
interchangeable through `load_ckpt`, including the hparams sidecar and the
slim/warm-start utilities built on top.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from test_fast.sh

import os

import jax.numpy as jnp
import numpy as np

from radnerf_tpu.utils.ckpt import (

    OrbaxAsyncWriter,
    load_ckpt,
    load_weights_into,
    save_ckpt,
    slim_ckpt,
)


def payload():
    return {
        "params": {
            "hash_table": jnp.arange(12.0).reshape(3, 2, 2),
            "geo": [jnp.ones((2, 4)), jnp.zeros((4,))],
        },
        "opt_state": {"mu": jnp.full((3,), 0.5)},
        "model_state": {"density_grid": jnp.zeros((2, 8))},
        "step": 17,
        "hparams": {"lr": 1e-2, "exp_name": "t", "moe_training": True},
    }


def assert_tree_equal(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            assert_tree_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        for x, y in zip(a, b):
            assert_tree_equal(x, y)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    p = payload()
    path = os.path.join(tmp_path, "epoch=3.ckpt")
    w = OrbaxAsyncWriter()
    w.save(path, p)
    w.wait_until_finished()
    assert os.path.isdir(path)
    back = load_ckpt(path)
    assert back["hparams"] == p["hparams"]
    assert int(np.asarray(back["step"])) == 17
    assert_tree_equal(back["params"], p["params"])
    assert_tree_equal(back["opt_state"], p["opt_state"])
    w.close()


def test_pickle_and_orbax_interchangeable(tmp_path):
    p = payload()
    pk = os.path.join(tmp_path, "pickle.ckpt")
    ob = os.path.join(tmp_path, "orbax.ckpt")
    save_ckpt(pk, p)
    w = OrbaxAsyncWriter()
    w.save(ob, p)
    w.wait_until_finished()
    w.close()
    a, b = load_ckpt(pk), load_ckpt(ob)
    assert_tree_equal(a["params"], b["params"])

    # slim + warm start work identically on both formats
    sa, sb = slim_ckpt(pk), slim_ckpt(ob)
    assert_tree_equal(sa["params"], sb["params"])
    fresh = {
        "hash_table": jnp.zeros((3, 2, 2)),
        "geo": [jnp.zeros((2, 4)), jnp.ones((4,))],
    }
    wa = load_weights_into(fresh, pk)
    wb = load_weights_into(fresh, ob)
    assert_tree_equal(wa, wb)
    np.testing.assert_allclose(
        np.asarray(wa["hash_table"]), np.arange(12.0).reshape(3, 2, 2)
    )
