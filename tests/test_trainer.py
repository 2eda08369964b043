"""Integration tests: full trainer systems on a tiny on-disk NSVF scene.

Covers the L6<->L0 seams the unit tests can't: dataset loading, device-side
batch gather, the shard_map'd train step over the 8-device CPU mesh,
density-grid updates, validation rendering, checkpoint save/resume."""

import os

import numpy as np
import pytest

from .fixtures import make_nsvf_dataset

pytestmark = pytest.mark.slow  # compile-heavy: excluded from scripts/test_fast.sh


class HP:
    """Minimal hparams namespace (argparse twin)."""

    def __init__(self, root, **kw):
        self.root_dir = root
        self.dataset_type = "nsvf"
        self.dataset_name = "Synthetic_NeRF"
        self.scene_name = "TestSphere"
        self.split = "train"
        self.downsample = 32 / 800
        self.scale = 0.5
        self.hash_table_size = 11
        self.opacity_loss_w = 1e-3
        self.distortion_loss_w = 0.0
        self.disp_loss_w = 0.0
        self.batch_size = 256
        self.num_epochs = 1
        self.warmup_steps = 256
        self.num_view = 0
        self.lr = 1e-2
        self.optimize_ext = False
        self.random_bg = False
        self.moe_training = False
        self.model_zoo_size = 2
        self.gate_type = "ray"
        self.model_type = "switch"
        self.cv_loss_w = 1e-2
        self.depth_mutual_loss_w = 5e-3
        self.overlap_ratio = 0.25
        self.eval_lpips = False
        self.val_only = False
        self.no_save_test = True
        self.exp_name = "test"
        self.ckpt_path = None
        self.weight_path = None
        self.num_devices = 0
        self.samples_per_ray = 48
        self.compute_dtype = "float32"
        self.val_chunk = 1024
        self.host_sampling = False
        self.seed = 0
        for k, v in kw.items():
            setattr(self, k, v)


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    return make_nsvf_dataset(str(tmp_path_factory.mktemp("data")))


def _shrink(system, steps=8):
    system.setup()
    system.train_dataset.STEPS_PER_EPOCH = steps
    # rebuild the LR schedule against the shrunken epoch
    system.configure_optimizers()
    system.build_steps()
    return system


class TestSingleTrainer:
    def test_fit_and_validate(self, scene_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(NeRFSystem(HP(scene_root)))
        # small model for CPU speed
        system.fit()
        assert system.global_step == 8
        m = system.validate(epoch=0)
        assert m["psnr"] is not None and np.isfinite(m["psnr"])
        # checkpoint was written and resumes
        ckpt = os.path.join(system.ckpt_dir, "epoch=0.ckpt")
        assert os.path.exists(ckpt)
        system2 = _shrink(NeRFSystem(HP(scene_root)))
        system2.resume(ckpt)
        assert system2.global_step == 8

    def test_oracle_split_flag(self, scene_root, tmp_path, monkeypatch):
        """oracle.py --split selects the rendered split end-to-end
        (VERDICT r3 #8: was an ORACLE_SPLIT env var)."""
        monkeypatch.chdir(tmp_path)
        import glob
        import sys

        import numpy as np

        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(NeRFSystem(HP(scene_root)))
        system.fit()
        ckpt = os.path.join(system.ckpt_dir, "epoch=0.ckpt")
        assert os.path.exists(ckpt)

        # write a 2-pose camera trajectory for the fixture scene
        poses = np.asarray(system.test_dataset.poses)[:2]  # (2, 3, 4)
        traj = np.tile(np.eye(4)[None], (2, 1, 1))
        traj[:, :3] = poses
        traj[:, :3, 0] *= -1  # loader flips back: [left df] -> [right df]
        np.savetxt(os.path.join(scene_root, "test_traj.txt"),
                   traj.reshape(-1, 4))

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        import oracle

        oracle.main([
            "--root_dir", scene_root, "--dataset_type", "nsvf",
            "--dataset_name", "Synthetic_NeRF", "--scene_name",
            "TestSphere", "--split", "test_traj", "--downsample",
            str(32 / 800), "--scale", "0.5", "--hash_table_size", "11",
            "--samples_per_ray", "48", "--compute_dtype", "float32",
            "--val_chunk", "1024", "--exp_name", "oracle_traj",
            "--ckpt_path", ckpt,
        ])
        pngs = glob.glob(
            "results/Synthetic_NeRF/TestSphere/oracle_traj/*.png"
        )
        # 2 trajectory poses -> 2 rgb + 2 depth dumps, no GT metrics
        assert len(pngs) == 4

    def test_moe_trainer(self, scene_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(
            NeRFSystem(HP(scene_root, moe_training=True, model_zoo_size=2))
        )
        losses = []
        h = system.h
        import jax

        for step in range(6):
            if step % 16 == 0:
                system.update_grid(warmup=True)
            system.key, kb, ks = jax.random.split(system.key, 3)
            batch = system._shard(system.sample_batch_indices(kb))
            (system.trainable, system.opt_state, loss, aux) = (
                system.train_step(
                    system.trainable, system.opt_state, system.model_state,
                    batch, system.data, ks,
                )
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # learning something


class TestOtherTrainers:
    @pytest.mark.parametrize("kind", ["switch", "block"])
    def test_other_step(self, scene_root, tmp_path, monkeypatch, kind):
        monkeypatch.chdir(tmp_path)
        import jax

        from radnerf_tpu.train.other_trainer import OtherNeRFSystem

        system = _shrink(
            OtherNeRFSystem(
                HP(scene_root, model_type=kind, model_zoo_size=2)
            ),
            steps=4,
        )
        system.update_grid(warmup=True)
        for _ in range(3):
            system.key, kb, ks = jax.random.split(system.key, 3)
            batch = system._shard(system.sample_batch_indices(kb))
            (system.trainable, system.opt_state, loss, aux) = (
                system.train_step(
                    system.trainable, system.opt_state, system.model_state,
                    batch, system.data, ks,
                )
            )
            assert np.isfinite(float(loss))


class TestDataParallelEquivalence:
    def test_grad_matches_single_device(self, scene_root, tmp_path,
                                        monkeypatch):
        """Ray-sharded gradients over 8 devices == the same batch on 1
        device, allclose at f32 tolerance (SURVEY.md §4 host-count
        invariance). This is binding because per-ray start jitter is
        derived from GLOBAL ray ids (trainer loss_fn), not from a
        per-device key fold — the only residual difference is the
        cross-device pmean's summation order."""
        monkeypatch.chdir(tmp_path)
        import jax

        from radnerf_tpu.parallel.step import make_grad_fn
        from radnerf_tpu.train.trainer import NeRFSystem

        res = {}
        for ndev in (1, 8):
            system = _shrink(
                NeRFSystem(HP(scene_root, num_devices=ndev, seed=7)),
                steps=2,
            )
            system.update_grid(warmup=True)
            key = jax.random.PRNGKey(0)
            batch = system._shard(system.sample_batch_indices(key))
            grad_fn = make_grad_fn(system._loss_fn, system.mesh)
            loss, grads = grad_fn(
                system.trainable, system.model_state, batch, system.data,
                jax.random.PRNGKey(1),
            )
            res[ndev] = (float(loss), jax.device_get(grads))
        np.testing.assert_allclose(res[1][0], res[8][0], rtol=1e-5)
        flat1 = jax.tree_util.tree_leaves(res[1][1])
        flat8 = jax.tree_util.tree_leaves(res[8][1])
        assert len(flat1) == len(flat8)
        for a, b in zip(flat1, flat8):
            scale = max(float(np.max(np.abs(a))), 1e-8)
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-5 * scale
            )


class TestOptimizeExt:
    def test_pose_refinement_trains(self, scene_root, tmp_path, monkeypatch):
        """--optimize_ext: per-image dR/dT join the bundle under their own
        Adam (reference hard-codes lr 1e-8, train.py:143-160) and receive
        gradients through the Rodrigues pose refinement."""
        monkeypatch.chdir(tmp_path)
        import jax
        import numpy as np

        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(NeRFSystem(HP(scene_root, optimize_ext=True)))
        assert "ext" in system.trainable
        system.update_grid(warmup=True)
        for _ in range(3):
            system.key, kb, ks = jax.random.split(system.key, 3)
            batch = system._shard(system.sample_batch_indices(kb))
            (system.trainable, system.opt_state, loss, aux) = (
                system.train_step(
                    system.trainable, system.opt_state, system.model_state,
                    batch, system.data, ks,
                )
            )
            system.params = system.trainable["model"]
        dT = np.asarray(system.trainable["ext"]["dT"])
        assert np.isfinite(dT).all()
        assert (dT != 0).any()  # gradients flowed into the extrinsics
        # slim export keeps poses when optimize_ext is set
        system.params = system.trainable["model"]
        system.ext_params = system.trainable["ext"]
        system.save_checkpoint(0)
        ck = os.path.join(system.ckpt_dir, "epoch=0.ckpt")
        assert os.path.exists(ck)

    def test_axisangle_identity(self):
        import numpy as np

        from radnerf_tpu.data.ray_utils import axisangle_to_R
        from radnerf_tpu.train.trainer import jnp_axisangle_to_R

        v = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        got = np.asarray(jnp_axisangle_to_R(v))
        want = axisangle_to_R(v)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # zero rotation -> identity (the init point must be exact & finite)
        z = np.asarray(jnp_axisangle_to_R(np.zeros((1, 3), np.float32)))
        np.testing.assert_allclose(z[0], np.eye(3), atol=1e-6)


class TestMicrobatchAccumulation:
    def test_matches_full_batch_gradients(self, scene_root, tmp_path,
                                          monkeypatch):
        """microbatch=2 gradient accumulation == one full-batch pass:
        the expected gradient is identical (losses are means over rays;
        per-ray jitter is global-ray-id derived, so slicing the batch
        changes nothing). f32 compute -> tight tolerance."""
        monkeypatch.chdir(tmp_path)
        import jax

        from radnerf_tpu.parallel.step import (
            make_grad_fn, microbatched_value_and_grad,
        )
        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(
            NeRFSystem(HP(scene_root, num_devices=1, seed=11)), steps=2
        )
        system.update_grid(warmup=True)
        batch = system.sample_batch_indices(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)

        full = make_grad_fn(system._loss_fn, system.mesh)
        loss_f, grads_f = full(
            system.trainable, system.model_state, batch, system.data, key
        )

        loss3 = lambda p, b, k: system._loss_fn(
            p, system.model_state, b, system.data, k
        )
        vg = jax.jit(microbatched_value_and_grad(loss3, 2))
        (loss_m, _), grads_m = vg(system.trainable, batch, key)

        np.testing.assert_allclose(
            float(loss_f), float(loss_m), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(grads_f)),
            jax.tree_util.tree_leaves(jax.device_get(grads_m)),
        ):
            scale = max(float(np.max(np.abs(a))), 1e-8)
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=max(1e-4 * scale, 1e-8)
            )


class TestAdaptiveBudget:
    def test_bucket_policy(self):
        from radnerf_tpu.train.trainer import next_budget_bucket

        assert next_budget_bucket(48, 0.99) == 56     # saturated: grow
        assert next_budget_bucket(112, 0.99) == 112   # top bucket: stay
        assert next_budget_bucket(64, 0.70) == 64     # hysteresis band
        assert next_budget_bucket(64, 0.30) == 32     # shrink toward ~70%
        assert next_budget_bucket(64, 0.10) == 16
        assert next_budget_bucket(16, 0.10) == 16     # bottom bucket: stay
        assert next_budget_bucket(48, 0.0) == 48      # dense sentinel: noop

    def test_trainer_rebuilds_steps(self, scene_root, tmp_path,
                                    monkeypatch):
        monkeypatch.chdir(tmp_path)
        import jax

        from radnerf_tpu.train.trainer import NeRFSystem

        system = _shrink(
            NeRFSystem(HP(scene_root, adaptive_budget=True)), steps=2
        )
        system.update_grid(warmup=True)
        old_step = system.train_step
        system._maybe_adapt_budget(0.05)   # far under-utilized
        assert system.rcfg.budget_per_ray < 64
        assert system.train_step is not old_step
        # the rebuilt step still runs
        system.key, kb, ks = jax.random.split(system.key, 3)
        batch = system._shard(system.sample_batch_indices(kb))
        (system.trainable, system.opt_state, loss, aux) = system.train_step(
            system.trainable, system.opt_state, system.model_state, batch,
            system.data, ks,
        )
        assert np.isfinite(float(loss))
        assert 0.0 <= float(aux["budget_util"]) <= 1.0
