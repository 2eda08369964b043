"""Device-mesh construction."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


RAY_AXIS = "ray"


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
