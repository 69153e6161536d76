"""nmf_tpu: a TPU-native JAX/XLA/Pallas framework for Neural Microfacet Fields.

A from-scratch, TPU-first rebuild of the capabilities of half-potato/nmf
(Neural Microfacet Fields for Inverse Rendering, ICCV 2023). The reference is
a single-GPU PyTorch+CUDA codebase; this framework re-designs the same
capabilities around XLA's compilation model:

- static shapes + masking instead of ragged compaction
  (reference: raymarching_full/src/raymarching.cu, samplers/*.py)
- functional parameter pytrees (flax.struct) instead of nn.Module mutation
- data parallelism over rays via jax.sharding / shard_map over a device Mesh
  (the reference has no distributed layer at all; see SURVEY.md section 2.3)
- pallas kernels for the hot gather/march paths.
"""

__version__ = "0.1.0"
