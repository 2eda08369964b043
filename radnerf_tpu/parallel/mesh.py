"""Device-mesh construction."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


RAY_AXIS = "ray"


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join a multi-host pod slice (jax.distributed).

    Call once per host process before any other JAX API. With no args, JAX
    auto-detects the TPU pod environment (GCE metadata); explicit args are
    for bring-your-own clusters. After this, `jax.devices()` is the GLOBAL
    device list and `make_mesh()` spans every chip in the slice — the ray
    batch shards globally, grad pmean rides ICI within a slice and DCN
    across slices. Safe to call when already initialized (no-op).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_mesh(num_devices: int = 0, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over `num_devices` (0 = all) local+global devices.

    Rad-NeRF's workload is pure data parallelism over rays (no attention, no
    pipeline): a single mesh axis rides ICI within a slice and DCN across
    slices; XLA picks the collective algorithm per topology.
    """
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))
