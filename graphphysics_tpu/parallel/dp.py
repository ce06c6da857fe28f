"""Data-parallel training step over a named mesh (``shard_map`` + collectives).

Brand-new design (the reference is strictly single-device, SURVEY.md §2.4):
the stacked batch ``[B, ...]`` shards along the ``data`` axis at graph
granularity; each device flattens its local graphs into one concat graph,
computes the masked loss and gradients, and the step reduces with XLA
collectives over ICI:

- gradients / loss: count-weighted ``psum`` so the result is bit-equivalent
  (up to fp reduction order) to the single-device masked mean over the global
  batch,
- normalizer running statistics: sum-deltas are ``psum``-merged while the
  accumulation *call* count advances by one per global step, reproducing
  single-device statistics exactly (SURVEY.md §7.3).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphphysics_tpu.core.graph import Graph, flatten_batched_graph
from graphphysics_tpu.core.normalizer import NormalizerState
from graphphysics_tpu.parallel.mesh import DATA_AXIS
from graphphysics_tpu.training import losses as losses_mod


def merge_normalizer_states(old, new, axis_name: str):
    """psum-merge per-shard normalizer deltas so multi-chip statistics match
    single-device ones: row sums/counts add across shards, the accumulation
    call counter advances once per global step."""

    def merge(o: NormalizerState, n: NormalizerState) -> NormalizerState:
        return NormalizerState(
            acc_count=o.acc_count + jax.lax.psum(n.acc_count - o.acc_count, axis_name),
            num_accumulations=o.num_accumulations
            + jax.lax.pmean(n.num_accumulations - o.num_accumulations, axis_name),
            acc_sum=o.acc_sum + jax.lax.psum(n.acc_sum - o.acc_sum, axis_name),
            acc_sum_sq=o.acc_sum_sq
            + jax.lax.psum(n.acc_sum_sq - o.acc_sum_sq, axis_name),
        )

    is_state = lambda x: isinstance(x, NormalizerState)
    return jax.tree_util.tree_map(merge, old, new, is_leaf=is_state)


_make_local_loss = losses_mod.make_local_loss


def make_dp_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    loss_kind: str = "l2",
    gmm_kwargs: dict | None = None,
) -> Callable:
    """Build the jitted SPMD train step: ``step(state, stacked_batch)`` where
    state is replicated and the batch leaves are ``[B, ...]`` sharded on
    axis 0."""
    return _make_sharded_train_step(
        sim, tx, masks, mesh, axis_name, flatten_batched_graph,
        loss_kind, gmm_kwargs,
    )


def make_graph_parallel_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    mesh: Mesh,
    graph_axis: str = "graph",
    loss_kind: str = "l2",
    gmm_kwargs: dict | None = None,
) -> Callable:
    """SPMD train step over an EDGE-PARTITIONED single graph
    (``parallel.graph_partition``): ``step(state, partitioned)`` where the
    partitioned Graph's leaves are ``[P, ...]`` sharded on axis 0 over
    ``graph_axis``. Per-layer collectives inside the model (all_gather or
    halo all_to_all) ride ICI; loss / gradients / normalizer statistics psum
    over the graph axis so the result matches the unpartitioned
    single-device step exactly."""

    def local_shard(stacked: Graph) -> Graph:
        # [1, ...] local shard -> local Graph
        lead = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        if lead != 1:
            raise ValueError(
                f"graph-parallel step: expected exactly one partition per "
                f"device on the '{graph_axis}' axis, got a local shard of "
                f"{lead} — partition the graph into mesh.shape[graph_axis] "
                f"parts (extra rows would be silently dropped)"
            )
        return jax.tree_util.tree_map(lambda a: a[0], stacked)

    return _make_sharded_train_step(
        sim, tx, masks, mesh, graph_axis, local_shard, loss_kind, gmm_kwargs
    )


def make_dp_graph_parallel_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    graph_axis: str = "graph",
    loss_kind: str = "l2",
    gmm_kwargs: dict | None = None,
) -> Callable:
    """Combined 2-D SPMD train step over a ``(data, graph)`` mesh — the
    pod-scale configuration: a batch of B graphs shards over ``data_axis``
    (one graph per data row) while EACH graph is edge-partitioned over
    ``graph_axis`` (``parallel.graph_partition``). ``step(state, batch)``
    where the batch leaves are ``[B, P, ...]`` sharded on the first two axes.

    Per-layer halo/all_gather collectives inside the model ride the graph
    axis only (the Graph's ``partition_axis``); loss, gradients, and
    normalizer statistics reduce over BOTH axes, so the result equals the
    pure-DP step on unpartitioned graphs (and therefore the single-device
    step) exactly."""

    def local_shard(stacked: Graph) -> Graph:
        # [1, 1, ...] local shard -> local Graph
        lead = jax.tree_util.tree_leaves(stacked)[0].shape[:2]
        if lead != (1, 1):
            raise ValueError(
                f"2-D (data x graph) step: expected a [1, 1, ...] local "
                f"shard (one graph per data row, one partition per graph "
                f"device), got {lead} — size the batch to "
                f"mesh.shape[data_axis] graphs of mesh.shape[graph_axis] "
                f"parts (extra rows would be silently dropped)"
            )
        return jax.tree_util.tree_map(lambda a: a[0, 0], stacked)

    return _make_sharded_train_step(
        sim, tx, masks, mesh, (data_axis, graph_axis), local_shard,
        loss_kind, gmm_kwargs,
    )


def _make_sharded_train_step(
    sim, tx, masks, mesh, axis_name, local_graph_fn, loss_kind, gmm_kwargs
) -> Callable:
    """Shared body of the DP / graph-parallel / combined 2-D steps: they
    differ only in the sharding axes (``axis_name``: one name or a tuple)
    and how a device turns its shard into a local Graph."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    nti = sim.config.node_type_index
    local_loss = _make_local_loss(masks, loss_kind, gmm_kwargs)

    def per_shard(params, normalizer, opt_state, shard):
        graph = local_graph_fn(shard)

        # Phase 1: accumulate local statistics, psum-merge the deltas so the
        # forward normalizes with the GLOBAL batch statistics (single-device
        # parity; sums are linear in the data).
        from graphphysics_tpu.models.simulator import Simulator

        _, mutated = sim.apply(
            {"params": params, "normalizer": normalizer},
            graph,
            method=Simulator.accumulate_stats,
            mutable=["normalizer"],
        )
        merged_norm = merge_normalizer_states(
            normalizer, mutated["normalizer"], axes
        )

        # Phase 2: forward/backward with merged stats (no re-accumulation).
        def loss_fn(p):
            out, target_dn, _ = sim.apply(
                {"params": p, "normalizer": merged_norm},
                graph,
                is_training=True,
                accumulate_stats=False,
            )
            node_type = graph.x[:, nti].astype(jnp.int32)
            loss_sum, count = local_loss(
                target_dn, out, node_type, graph.node_mask, graph.exclude_mask
            )
            # local masked mean for the backward pass; re-weighted globally
            loss = loss_sum / jnp.maximum(count, 1.0)
            return loss, count

        (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        total = jax.lax.psum(count, axes)
        w = count / jnp.maximum(total, 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, axes), grads
        )
        gloss = jax.lax.psum(loss * w, axes)

        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, merged_norm, new_opt, gloss

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(*axes)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, shard):
        new_params, new_norm, new_opt, loss = sharded(
            state["params"], state["normalizer"], state["opt_state"], shard
        )
        return {
            "params": new_params,
            "normalizer": new_norm,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, loss

    return step


# jitted sharded closures are cached so repeated calls (per trajectory /
# per epoch) hit the jit cache instead of retracing a fresh shard_map object
# each time (rollout compiles take minutes on the real chip); keys hold the
# module/mesh by strong reference, so no id-reuse aliasing.
_SHARDED_FN_CACHE: dict = {}


def graph_parallel_forward(sim_or_model, variables, partitioned: Graph, mesh: Mesh,
                           graph_axis: str = "graph", **apply_kwargs):
    """Run a model/simulator forward over an edge-partitioned graph; returns
    node-wise outputs re-stacked as ``[P, Nl, ...]``."""
    key = ("fwd", sim_or_model, mesh, graph_axis,
           tuple(sorted(apply_kwargs.items())))
    fn = _SHARDED_FN_CACHE.get(key)
    if fn is None:
        def per_shard(variables, stacked):
            graph = jax.tree_util.tree_map(lambda a: a[0], stacked)
            out = sim_or_model.apply(variables, graph, **apply_kwargs)
            return jax.tree_util.tree_map(lambda a: a[None], out)

        fn = jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(graph_axis)),
                out_specs=P(graph_axis),
                check_vma=False,
            )
        )
        _SHARDED_FN_CACHE[key] = fn
    return fn(variables, partitioned)


def partitioned_rollout(
    sim,
    variables,
    frames_parts: Graph,
    mesh: Mesh,
    rng,
    graph_axis: str = "graph",
    use_previous_data: bool = False,
    previous_data_start=None,
    previous_data_end=None,
):
    """Whole-trajectory autoregressive rollout over an edge-partitioned mesh:
    the scan runs per shard with the model's per-layer all_gathers riding the
    graph axis. ``frames_parts`` leaves are ``[T, P, ...]``
    (``graph_partition.partition_frames_np``), sharded on axis 1.

    Returns ``(predictions, targets)`` as global ``[T, N, d]`` arrays
    (parts re-concatenated on the node axis)."""
    from graphphysics_tpu.training.rollout import rollout as _rollout

    key = ("rollout", sim, mesh, graph_axis, use_previous_data,
           previous_data_start, previous_data_end)
    fn = _SHARDED_FN_CACHE.get(key)
    if fn is None:
        def per_shard(variables, stacked, rng):
            frames = jax.tree_util.tree_map(lambda a: a[:, 0], stacked)
            # decorrelate per-shard sampling streams (GMM eval draws)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(graph_axis))
            preds, targets = _rollout(
                sim, variables, frames, rng,
                use_previous_data=use_previous_data,
                previous_data_start=previous_data_start,
                previous_data_end=previous_data_end,
            )
            return preds, targets

        fn = jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(None, graph_axis), P()),
                out_specs=(P(None, graph_axis), P(None, graph_axis)),
                check_vma=False,
            )
        )
        _SHARDED_FN_CACHE[key] = fn
    return fn(variables, frames_parts, rng)
