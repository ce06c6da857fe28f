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


def save_eval_step(path: str, sim, variables, example_graph, **kwargs) -> str:
    """Export and write the serving artifact to ``path``."""
    blob = export_eval_step(sim, variables, example_graph, **kwargs)
    with open(path, "wb") as fp:
        fp.write(blob)
    return path


def load_eval_step_file(path: str) -> Callable:
    with open(path, "rb") as fp:
        return load_eval_step(fp.read())
