"""AOT serving exports via ``jax.export`` (StableHLO).

The reference serves predictions by loading its full Python stack
(``graphphysics/predict.py:32-114``: config → dataset → Lightning →
checkpoint). The TPU-idiomatic serving artifact is instead an
ahead-of-time-lowered StableHLO function with the trained parameters and
normalizer statistics BAKED IN: a single serialized blob that any JAX
process (or a PjRt C++ runtime) can deserialize and invoke without the
model's Python class definitions, config files, or checkpoint code.

The exported unit is the one-frame eval forward — normalize → model →
denormalize → predicted next fields (``models/simulator.py`` eval path,
reference ``simulator.py:292-347``) — i.e. exactly the per-frame work of
the autoregressive rollout; the serving loop feeds the prediction back into
the input fields host-side (or wraps this in its own scan).

Shapes are static (the Graph is padded), so one artifact serves one bucket
shape; export one artifact per bucket for size-bucketed datasets.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax


def _needs_sample_rng(sim) -> bool:
    model = getattr(sim, "model", None)
    return bool(getattr(model, "num_mixture_components", 0))


def export_eval_step(
    sim,
    variables,
    example_graph,
    platforms: Optional[Sequence[str]] = None,
    with_sample_rng: Optional[bool] = None,
) -> bytes:
    """Serialize the eval forward to a StableHLO artifact (bytes).

    The exported callable takes the Graph's array leaves (``jax.tree``
    flatten order; static meta fields are baked at export time) and returns
    the denormalized prediction ``[N, output_size]``. GMM models take a
    leading raw ``jax.random.PRNGKey`` (uint32[2]) for the per-node
    component sampling; ``with_sample_rng`` overrides the auto-detection.

    ``platforms``: lowering platforms (e.g. ``("tpu", "cpu")``) — defaults
    to the current backend.
    """
    leaves, treedef = jax.tree_util.tree_flatten(example_graph)
    if with_sample_rng is None:
        with_sample_rng = _needs_sample_rng(sim)

    from jax import export as jax_export

    if with_sample_rng:

        def f(key, *graph_leaves):
            g = jax.tree_util.tree_unflatten(treedef, list(graph_leaves))
            _, _, predicted = sim.apply(
                variables, g, is_training=False, rngs={"sample": key}
            )
            return predicted

        args = (jax.random.PRNGKey(0), *leaves)
    else:

        def f(*graph_leaves):
            g = jax.tree_util.tree_unflatten(treedef, list(graph_leaves))
            _, _, predicted = sim.apply(variables, g, is_training=False)
            return predicted

        args = tuple(leaves)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(f), **kwargs)(*args)
    return exported.serialize()


def load_eval_step(blob: bytes) -> Callable:
    """Deserialize an ``export_eval_step`` artifact into
    ``step(graph, key=None) -> predicted``.

    The caller's Graph must match the exported one structurally: same leaf
    shapes/dtypes and the same present/absent optional fields (None fields
    are absent from the flattened leaves).
    """
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(blob))

    def step(graph, key=None):
        leaves = jax.tree_util.tree_leaves(graph)
        args = leaves if key is None else [key, *leaves]
        return exported.call(*args)

    return step


def export_rollout(
    sim,
    variables,
    example_frames,
    use_previous_data: bool = False,
    previous_data_start: Optional[int] = None,
    previous_data_end: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the WHOLE-TRAJECTORY autoregressive rollout — the
    ``lax.scan`` over stacked frames with prediction feedback, previous-data
    carry, and boundary clamping (``training/rollout.py``; reference
    ``lightning_module.py:168-232``) — to one StableHLO artifact.

    The exported callable takes a raw PRNGKey plus the array leaves of a
    ``[T, ...]``-stacked frames Graph and returns ``(predictions, targets)``
    of shape ``[T, N, d]``. One artifact serves one (T, bucket) shape."""
    leaves, treedef = jax.tree_util.tree_flatten(example_frames)

    from jax import export as jax_export

    from graphphysics_tpu.training.rollout import rollout

    def f(key, *frame_leaves):
        frames = jax.tree_util.tree_unflatten(treedef, list(frame_leaves))
        return rollout(
            sim,
            variables,
            frames,
            key,
            use_previous_data=use_previous_data,
            previous_data_start=previous_data_start,
            previous_data_end=previous_data_end,
        )

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(f), **kwargs)(
        jax.random.PRNGKey(0), *leaves
    )
    return exported.serialize()


def load_rollout(blob: bytes) -> Callable:
    """Deserialize an ``export_rollout`` artifact into
    ``run(frames, key=None) -> (predictions, targets)``."""
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(blob))

    def run(frames, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return exported.call(key, *jax.tree_util.tree_leaves(frames))

    return run


def export_partitioned_eval_step(
    sim,
    variables,
    parts_example,
    mesh,
    graph_axis: str = "graph",
    platforms: Optional[Sequence[str]] = None,
    with_sample_rng: Optional[bool] = None,
) -> bytes:
    """Serialize the EDGE-PARTITIONED eval forward — the shard_map over a
    ``graph`` mesh with the per-layer halo/all_gather collectives inside
    (``parallel.dp.graph_parallel_forward``) — to one multi-device StableHLO
    artifact.

    This is the serving path for meshes past one chip's HBM (the 1M-node
    rows of ``benchmarks/max_scale.py``): the artifact records the mesh's
    device count and the leaves' shardings, and ``load_partitioned_eval_
    step`` invokes it on any mesh of the same size (CPU-mesh verifiable).
    The reference's serving path is single-device Python re-loading
    (``graphphysics/predict.py:32-114``); this has no analog there.

    The exported callable takes the partitioned Graph's ``[P, ...]`` array
    leaves (sharded on the graph axis) and returns ``[P, Nl, output_size]``
    node-wise predictions. GMM models take a leading PRNGKey, folded per
    shard like ``parallel.dp.partitioned_rollout``.
    """
    import jax.numpy as jnp  # noqa: F401
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jax import export as jax_export

    leaves, treedef = jax.tree_util.tree_flatten(parts_example)
    if with_sample_rng is None:
        with_sample_rng = _needs_sample_rng(sim)
    sh = NamedSharding(mesh, P(graph_axis))
    rep = NamedSharding(mesh, P())

    def per_shard(key, stacked):
        g = jax.tree_util.tree_unflatten(
            treedef, jax.tree_util.tree_leaves(stacked)
        )
        g = jax.tree_util.tree_map(lambda a: a[0], g)
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(graph_axis))
            _, _, predicted = sim.apply(
                variables, g, is_training=False, rngs={"sample": key}
            )
        else:
            _, _, predicted = sim.apply(variables, g, is_training=False)
        return predicted[None]

    if with_sample_rng:

        def f(key, *graph_leaves):
            stacked = jax.tree_util.tree_unflatten(treedef, list(graph_leaves))
            return shard_map(
                lambda k, s: per_shard(k, s), mesh=mesh,
                in_specs=(P(), P(graph_axis)), out_specs=P(graph_axis),
                check_vma=False,
            )(key, stacked)

        args = (
            jax.device_put(jax.random.PRNGKey(0), rep),
            *[jax.device_put(a, sh) for a in leaves],
        )
    else:

        def f(*graph_leaves):
            stacked = jax.tree_util.tree_unflatten(treedef, list(graph_leaves))
            return shard_map(
                lambda s: per_shard(None, s), mesh=mesh,
                in_specs=(P(graph_axis),), out_specs=P(graph_axis),
                check_vma=False,
            )(stacked)

        args = tuple(jax.device_put(a, sh) for a in leaves)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(f), **kwargs)(*args)
    return exported.serialize()


def load_partitioned_eval_step(blob: bytes) -> Callable:
    """Deserialize an ``export_partitioned_eval_step`` artifact into
    ``step(parts_graph, key=None) -> [P, Nl, d]``. The caller must place
    the partitioned Graph's leaves on a mesh with the artifact's device
    count, sharded on the graph axis (``parallel.shard_batch``)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(blob))

    def step(parts_graph, key=None):
        leaves = jax.tree_util.tree_leaves(parts_graph)
        args = leaves if key is None else [key, *leaves]
        return exported.call(*args)

    step.nr_devices = exported.nr_devices
    return step


def save_eval_step(path: str, sim, variables, example_graph, **kwargs) -> str:
    """Export and write the serving artifact to ``path``."""
    blob = export_eval_step(sim, variables, example_graph, **kwargs)
    with open(path, "wb") as fp:
        fp.write(blob)
    return path


def load_eval_step_file(path: str) -> Callable:
    with open(path, "rb") as fp:
        return load_eval_step(fp.read())
