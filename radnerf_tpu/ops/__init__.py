"""Native-op layer (L1/L2 equivalent): the TPU twins of the reference's
`vren` CUDA extension + tinycudann encoders.

Every op has a pure-JAX implementation (the semantic reference, unit-tested
against numpy goldens) and, where it matters for speed, a Pallas TPU kernel
that swaps in underneath the same API.
"""

from .morton import morton3d, morton3d_invert, packbits  # noqa: F401
from .intersection import ray_aabb_intersect, ray_sphere_intersect  # noqa: F401
from .trunc_exp import trunc_exp  # noqa: F401
from .sh import sh_encode  # noqa: F401
from .hashgrid import hashgrid_encode, init_hashgrid_table, HashGridConfig  # noqa: F401
from .marching import march_rays_train, MarchConfig  # noqa: F401
from .compositing import composite_train, composite_weights  # noqa: F401
from .distortion import distortion_loss  # noqa: F401
