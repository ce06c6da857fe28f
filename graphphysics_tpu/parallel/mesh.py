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


def make_hybrid_mesh(
    axis_names: Sequence[str] = (DATA_AXIS, GRAPH_AXIS),
    dcn_shape: Optional[Sequence[int]] = None,
    ici_shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Multi-slice mesh: per-axis sizes factor into a DCN part (across TPU
    slices / pods) and an ICI part (within a slice), so the cheap-bandwidth
    axes can be pinned to ICI. The intended production layout is
    ``data`` split across slices over DCN (one gradient ``psum`` per step)
    while the per-layer ``graph``-axis halo/all_gather collectives stay
    entirely on ICI — the layout recipe of the scaling playbook.

    ``dcn_shape[i] * ici_shape[i]`` is axis ``i``'s total size; axes with
    ``dcn_shape[i] == 1`` never cross a slice boundary. On real multi-slice
    TPU this uses ``mesh_utils.create_hybrid_device_mesh`` (device
    ``slice_index`` attributes) when the distinct slice count matches
    ``prod(dcn_shape)``; otherwise (CPU simulation, or a single real slice
    asked to emulate several) slices are emulated as contiguous equal-sized
    device groups, preserving the same outer=DCN/inner=ICI nesting so
    sharding layouts and tests carry over unchanged.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if dcn_shape is None:
        dcn_shape = (1,) * len(axis_names)
    if ici_shape is None:
        ici_shape = (len(devices) // int(np.prod(dcn_shape)),) + (1,) * (
            len(axis_names) - 1
        )
    if len(dcn_shape) != len(axis_names) or len(ici_shape) != len(axis_names):
        raise ValueError("dcn_shape/ici_shape must match axis_names length")
    total = int(np.prod(dcn_shape)) * int(np.prod(ici_shape))
    if total != len(devices):
        raise ValueError(
            f"make_hybrid_mesh: prod(dcn)*prod(ici)={total} != "
            f"{len(devices)} devices"
        )
    mesh_shape = tuple(int(d * i) for d, i in zip(dcn_shape, ici_shape))

    # Real multi-slice metadata only counts when the number of DISTINCT
    # slices matches the requested DCN factor — single-slice devices carry
    # slice_index=0 (not None), and create_hybrid_device_mesh would raise
    # for prod(dcn_shape) > 1 on them; emulate contiguous groups instead.
    slice_ids = {
        getattr(d, "slice_index", None) for d in devices
    } - {None}
    if len(slice_ids) == int(np.prod(dcn_shape)):
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            tuple(int(i) for i in ici_shape),
            tuple(int(d) for d in dcn_shape),
            devices=devices,
        )
        return Mesh(arr, tuple(axis_names))

    # Emulated slices: contiguous device-id groups. Build the nested
    # [dcn..., ici...] grid then interleave to [dcn0*ici0, dcn1*ici1, ...]
    # with the DCN factor outermost in every axis.
    arr = np.array(devices).reshape(tuple(dcn_shape) + tuple(ici_shape))
    k = len(axis_names)
    order = [x for pair in zip(range(k), range(k, 2 * k)) for x in pair]
    arr = arr.transpose(order).reshape(mesh_shape)
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
