"""Auto-resume after a hard kill (VERDICT r4 #8: failure handling).

A training subprocess is SIGKILLed mid-run after its first epoch
checkpoint lands; a second invocation with auto-resume must pick up the
newest checkpoint in the experiment dir and continue from the saved
step, finishing the remaining epochs. This is the restart path a
preempted TPU job takes (reference has no equivalent — trainers there
restart from scratch unless a ckpt path is passed by hand)."""

import os
import signal
import subprocess
import sys
import time

import pytest

from .fixtures import make_nsvf_dataset

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import os, sys
sys.path.insert(0, {repo!r})
from tests.test_trainer import HP
from radnerf_tpu.train.trainer import NeRFSystem

hp = HP({root!r}, num_epochs=3, batch_size=128, hash_table_size=11,
        warmup_steps=4)
system = NeRFSystem(hp)
system.setup()
system.train_dataset.STEPS_PER_EPOCH = 6
system.configure_optimizers()
system.build_steps()
resumed = system.auto_resume()
print("RESUMED", int(resumed), system.global_step, flush=True)
system.fit()
print("FINAL", system.global_step, flush=True)
"""


def _launch(tmp, root):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single-device: keep the subprocess light
    return subprocess.Popen(
        [sys.executable, "-u", "-c", DRIVER.format(repo=REPO, root=root)],
        cwd=tmp,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_kill_and_auto_resume(tmp_path):
    root = make_nsvf_dataset(str(tmp_path / "data"))
    tmp = str(tmp_path)
    ckpt = os.path.join(
        tmp, "ckpts", "Synthetic_NeRF", "TestSphere", "test",
        "epoch=0.ckpt",
    )

    proc = _launch(tmp, root)
    try:
        # wait for the first epoch checkpoint, let the write settle,
        # then kill the EXACT pid hard (no pattern killing)
        deadline = time.time() + 600
        while not os.path.exists(ckpt):
            assert proc.poll() is None, (
                "trainer died before first checkpoint:\n"
                + proc.stdout.read()
            )
            assert time.time() < deadline, "no checkpoint within 10 min"
            time.sleep(0.1)
        # save_ckpt writes atomically (tmp + os.replace), so existence
        # implies completeness — kill immediately, mid-epoch-1
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    proc2 = _launch(tmp, root)
    out, _ = proc2.communicate(timeout=900)
    assert proc2.returncode == 0, out
    # resumed from the epoch-0 checkpoint (step 6), not from scratch
    assert "RESUMED 1 6" in out, out
    assert "FINAL 18" in out, out
    # and the remaining epochs produced their checkpoints
    assert os.path.exists(ckpt.replace("epoch=0", "epoch=2")), out
