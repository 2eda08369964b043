"""Fields / models layer (L3 equivalent of the reference's models/networks.py,
switch_networks.py, block_networks.py, mega_networks.py).

All models are functional: `init_*` returns a params pytree (trainable) and
`init_*_state` returns the non-trainable state (occupancy grids, bbox);
`*_density` / `*_forward` are pure functions jitted by the render layer.
Expert ensembles store per-expert weights on a leading (K, ...) axis and are
evaluated with vmap — the TPU-native form of the reference's Python loop
over `geo_net_{i}` attributes.
"""

from .mlp import init_mlp, apply_mlp, init_stacked_mlp  # noqa: F401
from .ngp import NGPConfig, init_ngp, init_ngp_state  # noqa: F401
from .mngp import init_mngp, init_mngp_state  # noqa: F401
from .gates import init_ray_gate, apply_ray_gate  # noqa: F401
