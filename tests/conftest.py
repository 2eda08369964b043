"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware."""

import os
import sys

# Accelerator plugins register from sitecustomize at INTERPRETER START —
# before this conftest runs — and a registered single-client TPU tunnel
# would serialize the suite and wedge concurrent bench/train jobs. A
# conftest cannot unregister a plugin, but it CAN re-exec pytest under a
# scrubbed environment before any jax backend initializes. The exec
# itself happens in pytest_configure (below) with capture suspended —
# at conftest-import time pytest's fd-level capture is already active,
# and an exec'd child would inherit the capture temp file and lose all
# output. Opt-out for the tpu-marked exactness tests: RADNERF_TPU_TESTS=1
# runs on the device (scripts/test_tpu.sh).
_NEEDS_REEXEC = (
    any(".axon_site" in p for p in sys.path)
    and os.environ.get("RADNERF_TPU_TESTS") != "1"
    and os.environ.get("_RADNERF_PYTEST_REEXEC") != "1"
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_RADNERF_PYTEST_REEXEC"] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stderr.write(
        "[conftest] TPU plugin detected on sys.path; re-exec'ing pytest "
        "on CPU so the single-client device tunnel stays closed (set "
        "RADNERF_TPU_TESTS=1 to run tpu-marked tests on the device)\n"
    )
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )


if not _NEEDS_REEXEC:
    if os.environ.get("RADNERF_TPU_TESTS") != "1":
        # Keep the axon TPU plugin off the path: tests are CPU-only, and
        # plugin discovery opens the (single-client) TPU tunnel, wedging
        # concurrent runs.
        sys.path = [p for p in sys.path if ".axon_site" not in p]
        os.environ["PYTHONPATH"] = ""

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"  # force: global env = 'axon'

    import jax

    from radnerf_tpu.utils import enable_compilation_cache

    jax.config.update("jax_enable_x64", False)
    enable_compilation_cache()
