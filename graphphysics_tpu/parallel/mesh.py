"""Device mesh helpers.

The reference has no distributed support at all (SURVEY.md §2.4:
``Trainer(devices=1)``, no collectives); everything here is new TPU-first
design: a named ``jax.sharding.Mesh`` with a ``data`` axis for batch/graph
parallelism (graphs shard at graph granularity because concat-batching keeps
edges local to their graph) and room for a ``graph`` axis (edge partitioning)
as the scale-out direction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available ({devices[0].platform}); for CPU "
                f"simulation set XLA_FLAGS=--xla_force_host_platform_device_"
                f"count=N and JAX_PLATFORMS=cpu before jax initializes"
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard a stacked batch pytree (leaves ``[B, ...]``) along its leading
    axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host-side stacked batch onto the mesh, sharded on axis 0.
    ``None`` leaves pass through."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch
    )
