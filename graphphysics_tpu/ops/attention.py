"""Sparse (mesh-adjacency-masked) multi-head attention on edge lists.

First-party replacement for the reference's DGL sparse attention trio —
SDDMM (``dglsp.bsddmm``, ``graphphysics/models/layers.py:415``), sparse row
softmax (``:416``), and SpMM (``dglsp.bspmm``, ``:450``) — re-expressed as
gather + segment ops over a static padded edge list.

Semantics match the reference exactly: with ``A = spmatrix(edge_index)`` the
DGL path computes, for each node ``i``, a softmax over its *out*-edges
``(i -> j)`` of ``<q_i, k_j>`` and aggregates ``v_j``; i.e. the softmax
segment is ``senders`` and keys/values are gathered at ``receivers``. Mesh
adjacency is symmetric so this equals in-edge attention, but we keep the exact
convention for bit-level parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graphphysics_tpu.ops.ell_ops import (
    ell_gather,
    ell_repeat,
    ell_segment_sum,
    ell_softmax,
)
from graphphysics_tpu.ops.segment import masked_segment_sum, segment_softmax


def sparse_graph_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_mask: Optional[jax.Array] = None,
    scale: float = 1.0,
    ell_degree: Optional[int] = None,
    twin_perm: Optional[jax.Array] = None,
    partition_axis: Optional[str] = None,
) -> jax.Array:
    """Adjacency-masked attention.

    Args:
        q, k, v: ``[N, H, Dh]`` per-head projections.
        senders, receivers: ``[E]`` int32 edge list (reference
            ``edge_index[0] / edge_index[1]``).
        num_nodes: static N.
        edge_mask: ``[E]`` bool validity of padded edges.
        scale: multiplied into the scores (the reference uses
            ``1/sqrt(num_heads)`` due to its ``(N, Dh, H)`` layout; see
            ``models.layers.Attention``).
        ell_degree/twin_perm: when the graph is in fixed-degree ELL layout
            (``topology.ell``), run the scatter-free dense path. The query
            node is then the slot OWNER (``receivers``) and keys/values come
            from ``senders`` — the transpose of the COO convention, equal on
            the symmetric mesh adjacency the reference relies on.

    Returns:
        ``[N, H, Dh]`` attention output.
    """
    if partition_axis is not None:
        # Edge-partitioned SPMD (parallel.graph_partition): q at LOCAL segment
        # nodes (receivers), k/v gathered from the all-gathered global table
        # at ``senders``; softmax + aggregation are local segment ops. Equals
        # the COO convention on the symmetric mesh adjacency.
        k_table = jax.lax.all_gather(k, partition_axis, axis=0, tiled=True)
        v_table = jax.lax.all_gather(v, partition_axis, axis=0, tiled=True)
        q_e = jnp.take(q, receivers, axis=0)
        k_e = jnp.take(k_table, senders, axis=0)
        scores = jnp.einsum(
            "ehd,ehd->eh", q_e, k_e, preferred_element_type=jnp.float32
        ) * jnp.asarray(scale, q.dtype)
        attn = segment_softmax(
            scores, receivers, num_segments=num_nodes, mask=edge_mask
        )
        v_e = jnp.take(v_table, senders, axis=0)
        weighted = v_e * attn[..., None].astype(v_e.dtype)
        return masked_segment_sum(weighted, receivers, num_nodes, mask=edge_mask)

    if ell_degree is not None:
        q_e = ell_repeat(q, ell_degree)  # [E, H, Dh]
        k_e = ell_gather(k, senders, twin_perm, ell_degree)
        scores = jnp.einsum(
            "ehd,ehd->eh", q_e, k_e, preferred_element_type=jnp.float32
        ) * jnp.asarray(scale, q.dtype)
        attn = ell_softmax(scores, ell_degree, edge_mask)  # [E, H]
        v_e = ell_gather(v, senders, twin_perm, ell_degree)
        weighted = v_e * attn[..., None].astype(v_e.dtype)
        return ell_segment_sum(weighted, ell_degree, edge_mask)

    q_e = jnp.take(q, senders, axis=0)  # [E, H, Dh]
    k_e = jnp.take(k, receivers, axis=0)  # [E, H, Dh]
    scores = jnp.einsum(
        "ehd,ehd->eh", q_e, k_e, preferred_element_type=jnp.float32
    ) * jnp.asarray(scale, q.dtype)
    attn = segment_softmax(
        scores, senders, num_segments=num_nodes, mask=edge_mask
    )  # [E, H]
    v_e = jnp.take(v, receivers, axis=0)  # [E, H, Dh]
    weighted = v_e * attn[..., None].astype(v_e.dtype)
    return masked_segment_sum(weighted, senders, num_nodes, mask=edge_mask)
