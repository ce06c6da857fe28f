"""Segment reductions over padded edge lists.

These are the TPU-native replacements for the reference's externally-delegated
sparse primitives: torch-scatter's ``aggr="add"`` message aggregation
(``graphphysics/models/layers.py:649,694``) and DGL's sparse row softmax
(``layers.py:414-419``). Everything operates on static-shape edge lists with a
validity mask; XLA lowers the gathers/scatters to efficient TPU code, and the
Pallas kernels in ``ops.pallas`` provide fused fast paths on the same layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum ``data`` (``[E, ...]``) into ``num_segments`` rows by ``segment_ids``.

    ``mask`` (``[E]`` bool) zeroes padded edges' contributions.
    """
    if mask is not None:
        data = data * mask.reshape(mask.shape + (1,) * (data.ndim - 1)).astype(
            data.dtype
        )
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-16,
) -> jax.Array:
    """Numerically-stable softmax of per-edge ``scores`` (``[E, ...]``) within
    each segment — the masked-edge analog of DGL's sparse ``softmax()`` over a
    row's *stored* entries. Padded edges get probability 0; empty segments
    produce all-zero rows (harmless: nothing aggregates from them).
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        scores = jnp.where(m, scores, _NEG_INF)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(scores - seg_max[segment_ids])
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        ex = jnp.where(m, ex, 0.0)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / (denom[segment_ids] + eps)
