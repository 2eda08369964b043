"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware."""

import os
import sys

# Keep the axon TPU plugin off the path: tests are CPU-only, and plugin
# discovery opens the (single-client) TPU tunnel, wedging concurrent runs.
sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ""

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the global env says 'axon'

import jax  # noqa: E402

from radnerf_tpu.utils import enable_compilation_cache  # noqa: E402

jax.config.update("jax_enable_x64", False)
enable_compilation_cache()
