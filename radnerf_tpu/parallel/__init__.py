"""Distribution layer — data parallelism over rays on a device mesh.

The reference has no working multi-device path (DDP plumbing commented out,
`strategy=None`; SURVEY.md §2.8): one GPU per scene, full stop. Here
distribution is first-class and TPU-native:

- one mesh axis `ray` spanning all chips (ICI within a slice, DCN across);
- parameters + occupancy grids replicated, the ray batch sharded;
- gradients `psum`-averaged over `ray` inside the shard_map'd step (XLA
  overlaps the all-reduce with the backward pass);
- density-grid updates run replicated with a shared PRNG key, so every
  replica computes bit-identical grids — no grid sync collective needed;
- validation metrics `all_gather`ed per image.
"""

from .mesh import initialize_multihost, make_mesh  # noqa: F401
from .step import make_train_step, shard_batch  # noqa: F401
