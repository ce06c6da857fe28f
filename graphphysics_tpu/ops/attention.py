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

    Returns:
        ``[N, H, Dh]`` attention output.
    """
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
