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

from graphphysics_tpu.ops.halo import partitioned_gather
from graphphysics_tpu.ops.ell_ops import (
    ell_gather,
    ell_repeat,
    ell_segment_sum,
    ell_softmax,
)
from graphphysics_tpu.ops.segment import (
    masked_segment_sum,
    segment_softmax,
    take_rows,
)


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
    halo_send_idx: Optional[jax.Array] = None,
    csr_bounds: Optional[jax.Array] = None,
    csr_max_chunks: Optional[int] = None,
    halo_dtype: Optional[str] = None,
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
        csr_bounds/csr_max_chunks: when the edge list is sender-sorted CSR
            (``edge_layout="csr"``), softmax+SpMM run in the fused Pallas
            kernel (``ops.pallas_attention``) — same COO convention, same
            result; measured faster at large-3D-mesh scale.

    Returns:
        ``[N, H, Dh]`` attention output.

    Layout note: all edge-sized intermediates (the gathers) are kept 2D
    ``[E, H*Dh]`` — a 3D ``[E, H, Dh]`` gather output tiles as ``(Dh,)``
    lanes on TPU and pads HBM up to 8x for small head dims (observed OOM at
    aneurysm scale). Per-head score/weight math is done with head-blocked
    reshapes of the 2D arrays, which XLA fuses without materializing 3D.
    """
    n, h, dh = q.shape
    d = h * dh
    q2 = q.reshape(n, d)  # head-blocked columns: head i owns [i*dh, (i+1)*dh)
    kv2 = jnp.concatenate([k.reshape(n, d), v.reshape(n, d)], axis=1)
    scale = jnp.asarray(scale, q.dtype)

    def scores_of(q_e, k_e):  # [E, d] x2 -> [E, H]
        e = q_e.shape[0]
        # accumulate the per-head dot in f32 even when activations are bf16
        prod = q_e.astype(jnp.float32) * k_e.astype(jnp.float32)
        return prod.reshape(e, h, dh).sum(axis=-1) * scale.astype(jnp.float32)

    def weight(v_e, attn):  # [E, d], [E, H] -> [E, d]
        e = v_e.shape[0]
        return (
            v_e.reshape(e, h, dh) * attn[:, :, None].astype(v_e.dtype)
        ).reshape(e, d)

    if partition_axis is not None:
        # Edge-partitioned SPMD (parallel.graph_partition): q at LOCAL segment
        # nodes (receivers), k/v gathered at ``senders`` from the all-gathered
        # global table — or the O(boundary) halo exchange table (ops.halo) —
        # softmax + aggregation are local segment ops. Equals the COO
        # convention on the symmetric mesh adjacency.
        q_e = take_rows(q2, receivers)
        kv_e = partitioned_gather(
            kv2, senders, partition_axis, halo_send_idx, halo_dtype
        )
        k_e, v_e = kv_e[:, :d], kv_e[:, d:]
        if csr_bounds is not None:
            # per-part receiver-sorted CSR (partition_graph_*_np(csr=True)):
            # the local softmax+SpMM runs in the fused Pallas kernel on each
            # device's block — the two large-mesh features composed. Only
            # the gather above touched the collective; the kernel is local.
            from graphphysics_tpu.ops.pallas_attention import (
                _NEG,
                csr_softmax_spmm,
            )

            scores = scores_of(q_e, k_e)  # [E, H] f32
            seg = receivers.astype(jnp.int32)
            if edge_mask is not None:
                scores = jnp.where(edge_mask[:, None], scores, _NEG)
                seg = jnp.where(edge_mask, seg, num_nodes)
            out = csr_softmax_spmm(
                scores, v_e, seg, csr_bounds, num_nodes,
                max_chunks=csr_max_chunks,
            )
            return out.reshape(num_nodes, h, dh).astype(q.dtype)
        attn = segment_softmax(
            scores_of(q_e, k_e), receivers, num_segments=num_nodes, mask=edge_mask
        )
        out = masked_segment_sum(
            weight(v_e, attn), receivers, num_nodes, mask=edge_mask
        )
        return out.reshape(num_nodes, h, dh)

    if ell_degree is not None:
        q_e = ell_repeat(q2, ell_degree)  # [E, d]
        kv_e = ell_gather(kv2, senders, twin_perm, ell_degree)
        k_e, v_e = kv_e[:, :d], kv_e[:, d:]
        attn = ell_softmax(scores_of(q_e, k_e), ell_degree, edge_mask)  # [E, H]
        out = ell_segment_sum(weight(v_e, attn), ell_degree, edge_mask)
        return out.reshape(num_nodes, h, dh)

    if csr_bounds is not None:
        from graphphysics_tpu.ops.pallas_attention import csr_sparse_attention

        return csr_sparse_attention(
            q, k, v, senders, receivers, csr_bounds,
            edge_mask=edge_mask, scale=scale,
            max_chunks=csr_max_chunks,
        )

    q_e = take_rows(q2, senders)  # [E, d]
    kv_e = take_rows(kv2, receivers)  # [E, 2d]
    k_e, v_e = kv_e[:, :d], kv_e[:, d:]
    attn = segment_softmax(
        scores_of(q_e, k_e), senders, num_segments=num_nodes, mask=edge_mask
    )  # [E, H]
    out = masked_segment_sum(
        weight(v_e, attn), senders, num_nodes, mask=edge_mask
    )
    return out.reshape(num_nodes, h, dh)
