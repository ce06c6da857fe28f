"""Whole-trajectory autoregressive rollout as ``lax.scan``.

TPU-native re-design of the reference's Lightning rollout state machine
(``graphphysics/training/lightning_module.py:163-232``): instead of stateful
per-batch Python callbacks, the entire trajectory rollout is a single jitted
scan over stacked frames, carrying (last prediction, last previous-data
prediction, first-step flag, PRNG). Semantics preserved exactly:

- autoregressive feedback into ``x[output_index_start:end]``
  (``lightning_module.py:173-175``),
- optional derived-feature feedback ``predicted - current_output`` into
  ``x[previous_data_start:end]`` (``:176-179,194``),
- boundary clamping ``predicted[mask] = target[mask]`` with
  ``mask = NOT(NORMAL | OUTFLOW)`` (``build_mask``, ``:17-25``, applied ``:191``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.core.nodetype import NodeType


def build_mask(node_type: jax.Array) -> jax.Array:
    """True for nodes whose prediction is clamped to ground truth
    (reference ``build_mask``: NOT (NORMAL or OUTFLOW))."""
    keep = jnp.logical_or(
        node_type == int(NodeType.NORMAL), node_type == int(NodeType.OUTFLOW)
    )
    return jnp.logical_not(keep)


def rollout(
    sim,
    variables,
    frames: Graph,
    rng: jax.Array,
    use_previous_data: bool = False,
    previous_data_start: Optional[int] = None,
    previous_data_end: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run the autoregressive rollout over stacked trajectory frames.

    Args:
        sim: the ``Simulator`` module.
        variables: ``{"params": ..., "normalizer": ...}``.
        frames: a Graph whose leaves carry a leading time axis ``[T, ...]``
            (stacked padded per-frame graphs of one trajectory).
        rng: PRNG key (GMM sampling at eval).

    Returns:
        ``(predictions [T, N, d], targets [T, N, d])`` with boundary-clamped
        predictions, exactly what the reference accumulates for
        ``val_all_rollout_rmse``.
    """
    cfg = sim.config
    os_, oe = cfg.output_index_start, cfg.output_index_end
    n = frames.x.shape[1]
    d = oe - os_

    def step(carry, frame: Graph):
        last_pred, last_prev, is_first, key = carry
        x = frame.x
        fed = jnp.where(is_first, x[:, os_:oe], last_pred)
        x = x.at[:, os_:oe].set(fed)
        if use_previous_data:
            prev_fed = jnp.where(
                is_first, x[:, previous_data_start:previous_data_end], last_prev
            )
            x = x.at[:, previous_data_start:previous_data_end].set(prev_fed)
        g = frame.replace(x=x)

        mask = build_mask(g.x[:, cfg.node_type_index].astype(jnp.int32))
        current_output = x[:, os_:oe]

        key, sub = jax.random.split(key)
        _, _, predicted = sim.apply(
            variables, g, is_training=False, rngs={"sample": sub}
        )
        predicted = jnp.where(mask[:, None], g.y, predicted)

        new_prev = last_prev
        if use_previous_data:
            new_prev = predicted - current_output
        return (predicted, new_prev, jnp.zeros((), bool), key), (predicted, g.y)

    prev_width = (
        previous_data_end - previous_data_start if use_previous_data else d
    )
    init = (
        jnp.zeros((n, d), frames.x.dtype),
        jnp.zeros((n, prev_width), frames.x.dtype),
        jnp.ones((), bool),
        rng,
    )
    _, (predictions, targets) = jax.lax.scan(step, init, frames)
    return predictions, targets


@partial(jax.jit, static_argnames=("sim", "use_previous_data",
                                   "previous_data_start", "previous_data_end"))
def jitted_rollout(
    sim,
    variables,
    frames: Graph,
    rng: jax.Array,
    use_previous_data: bool = False,
    previous_data_start: Optional[int] = None,
    previous_data_end: Optional[int] = None,
):
    return rollout(
        sim,
        variables,
        frames,
        rng,
        use_previous_data=use_previous_data,
        previous_data_start=previous_data_start,
        previous_data_end=previous_data_end,
    )


@partial(jax.jit, static_argnames=("sim", "use_previous_data",
                                   "previous_data_start", "previous_data_end"))
def jitted_batched_rollout(
    sim,
    variables,
    frames: Graph,
    rngs: jax.Array,
    use_previous_data: bool = False,
    previous_data_start: Optional[int] = None,
    previous_data_end: Optional[int] = None,
):
    """Roll out a BATCH of trajectories at once: ``frames`` carries leaves
    shaped ``[B, T, ...]`` (a stack of per-trajectory frame stacks) and
    ``rngs`` is ``[B]`` PRNG keys; returns ``(predictions, targets)`` shaped
    ``[B, T, N, d]``.

    The reference validates strictly sequentially — one trajectory at a time
    through Lightning callbacks (``lightning_module.py:204-232``). Rollouts of
    different trajectories are independent, so here they vmap over ``B``; with
    ``frames`` placed under ``NamedSharding(mesh, P("data"))`` XLA's SPMD
    partitioner runs each trajectory's scan on its own device and validation
    becomes embarrassingly parallel over the data mesh axis (each device holds
    only its own trajectory's frames)."""

    def one(f, k):
        return rollout(
            sim,
            variables,
            f,
            k,
            use_previous_data=use_previous_data,
            previous_data_start=previous_data_start,
            previous_data_end=previous_data_end,
        )

    return jax.vmap(one)(frames, rngs)


def rollout_rmse(
    predictions: jax.Array, targets: jax.Array, node_mask: jax.Array
) -> jax.Array:
    """All-rollout RMSE over valid nodes (reference
    ``on_validation_epoch_end``, ``lightning_module.py:242-257`` — the padding
    mask is new; on unpadded data this is exactly sqrt(mean((p - t)^2)))."""
    w = node_mask.astype(predictions.dtype)[None, :, None]
    se = (predictions - targets) ** 2 * w
    denom = jnp.maximum(w.sum() * predictions.shape[0] * predictions.shape[-1], 1.0)
    return jnp.sqrt(se.sum() / denom)
