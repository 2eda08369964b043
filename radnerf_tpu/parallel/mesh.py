"""Device-mesh construction."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


RAY_AXIS = "ray"


def distributed_is_initialized() -> bool:
    """True iff jax.distributed has a live client in this process."""
    if hasattr(jax.distributed, "is_initialized"):   # JAX >= 0.4.35
        return bool(jax.distributed.is_initialized())
    from jax._src import distributed as _dist      # pragma: no cover

    state = getattr(_dist, "global_state", None)
    return state is not None and getattr(state, "client", None) is not None


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
    across slices. Safe to call when already initialized (no-op via
    distributed_is_initialized, not error-string matching).
    """
    if distributed_is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


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
