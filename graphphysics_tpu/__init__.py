"""graphphysics_tpu — a TPU-native framework for GNN mesh-physics simulation.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the reference
``graphphysics`` package (MeshGraphNet-style encode-process-decode and sparse
graph transformers for CFD / solid mechanics), built TPU-first:

- static-shape padded graph containers (``core.graph``) so everything jits once,
- first-party segment / sparse-attention ops (``ops``) with Pallas fast paths,
- functional normalizer state threaded through the train step (``core.normalizer``),
- whole-trajectory autoregressive rollout as ``lax.scan`` (``training.rollout``),
- SPMD parallelism over a ``jax.sharding.Mesh`` (``parallel``).
"""

__version__ = "0.1.0"
