"""radnerf_tpu — a TPU-native (JAX/XLA/Pallas) re-design of Rad-NeRF.

Brand-new framework with the capabilities of thu-nics/Rad-NeRF (NeurIPS'24,
ray-decoupled MoE training of Instant-NGP-style NeRFs), architected for TPU:

- static-shape ray marching on a closed-form sample lattice (no atomics/CSR
  compaction kernels; see `radnerf_tpu.ops.marching`)
- differentiable masked compositing with exact early-stop semantics
  (`radnerf_tpu.ops.compositing`)
- multiresolution hash-grid encoding as gather + segment-sum scatter-add
  (`radnerf_tpu.ops.hashgrid`), with Pallas kernels for the hot paths
- experts as a stacked weight axis evaluated with vmap/einsum, not a loop
  (`radnerf_tpu.models.mngp`)
- data parallelism over rays via `jax.sharding.Mesh` + shard_map
  (`radnerf_tpu.parallel`)

Layer map mirrors the reference (see SURVEY.md §1): data -> ops (L1/L2) ->
models (L3) -> render (L4) -> losses (L5) -> train (L6) -> scripts (L7).
"""

__version__ = "0.1.0"
