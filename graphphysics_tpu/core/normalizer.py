"""Functional online normalizer.

Re-design of the reference's buffer-mutating ``Normalizer``
(``graphphysics/models/layers.py:265-392``) as explicit pytree state threaded
through the jitted train step — the idiomatic JAX/TPU form. Matches the
reference numerics exactly:

- running mean = acc_sum / max(acc_count, 1)
- std = sqrt(clamp(acc_sum_sq / count - mean^2, 0)), floored at ``std_epsilon``
- accumulation stops after ``max_accumulations`` calls
- data is accumulated *before* normalizing (so the first call normalizes with
  the statistics of its own batch)

Extension over the reference: a validity mask excludes padding rows from the
statistics, so padded static-shape batches reproduce unpadded statistics. Under
data parallelism the sums below are global reductions over the sharded batch,
so multi-chip statistics match single-device ones by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _dc(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
@dataclasses.dataclass(frozen=True)
class NormalizerState:
    acc_count: jax.Array  # f32 scalar: number of accumulated rows
    num_accumulations: jax.Array  # f32 scalar: number of accumulate() calls
    acc_sum: jax.Array  # [size]
    acc_sum_sq: jax.Array  # [size]


def init(size: int, dtype=jnp.float32) -> NormalizerState:
    return NormalizerState(
        acc_count=jnp.zeros((), dtype),
        num_accumulations=jnp.zeros((), dtype),
        acc_sum=jnp.zeros((size,), dtype),
        acc_sum_sq=jnp.zeros((size,), dtype),
    )


MAX_ACCUMULATIONS = 10**5
STD_EPSILON = 1e-8


def mean(state: NormalizerState) -> jax.Array:
    safe_count = jnp.maximum(state.acc_count, 1.0)
    return state.acc_sum / safe_count


def std_with_epsilon(state: NormalizerState) -> jax.Array:
    safe_count = jnp.maximum(state.acc_count, 1.0)
    variance = state.acc_sum_sq / safe_count - mean(state) ** 2
    return jnp.maximum(jnp.sqrt(jnp.clip(variance, min=0.0)), STD_EPSILON)


def accumulate(
    state: NormalizerState,
    data: jax.Array,
    mask: Optional[jax.Array] = None,
) -> NormalizerState:
    """Add ``data`` (``[..., size]``) to the running statistics.

    ``mask`` (``[...]`` bool) selects valid rows; padding rows contribute
    nothing. A no-op once ``num_accumulations`` reaches ``MAX_ACCUMULATIONS``.
    """
    data = jax.lax.stop_gradient(data).astype(state.acc_sum.dtype)
    flat = data.reshape(-1, data.shape[-1])
    if mask is not None:
        m = mask.reshape(-1, 1).astype(flat.dtype)
        flat = flat * m
        count = jnp.sum(m)
    else:
        count = jnp.asarray(flat.shape[0], flat.dtype)
    live = state.num_accumulations < MAX_ACCUMULATIONS
    w = live.astype(flat.dtype)
    return NormalizerState(
        acc_count=state.acc_count + w * count,
        num_accumulations=state.num_accumulations + w,
        acc_sum=state.acc_sum + w * jnp.sum(flat, axis=0),
        acc_sum_sq=state.acc_sum_sq + w * jnp.sum(flat**2, axis=0),
    )


def normalize(
    state: NormalizerState,
    data: jax.Array,
    accumulate_stats: bool = False,
    mask: Optional[jax.Array] = None,
) -> Tuple[NormalizerState, jax.Array]:
    """Normalize ``data``; optionally first fold it into the running stats
    (training mode), mirroring ``Normalizer.forward`` in the reference."""
    if accumulate_stats:
        state = accumulate(state, data, mask)
    out = (data - mean(state)) / std_with_epsilon(state)
    return state, out


def inverse(state: NormalizerState, normalized: jax.Array) -> jax.Array:
    return normalized * std_with_epsilon(state) + mean(state)
