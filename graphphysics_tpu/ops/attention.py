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

from graphphysics_tpu.ops.halo import halo_recv, partitioned_gather
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
    csr_bounds_halo: Optional[jax.Array] = None,
    num_local_edges: Optional[int] = None,
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
        num_local_edges/csr_bounds_halo: split-edge halo layout
            (``partition_graph_halo_np(split_local=True)``): edge slots
            ``[0, num_local_edges)`` have LOCAL senders and the rest halo
            senders. The local partial softmax is computed independently of
            the all_to_all and merged with the halo partial by the online-
            softmax (m, l) combine, so XLA's latency-hiding scheduler can
            bury the collective under the local attention compute.

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
        if num_local_edges is not None and halo_send_idx is not None:
            return _overlapped_partitioned_attention(
                q2, kv2, senders, receivers, num_nodes, edge_mask, scale,
                partition_axis, halo_send_idx, halo_dtype,
                csr_bounds, csr_bounds_halo, csr_max_chunks,
                num_local_edges, h, dh, scores_of, q.dtype,
            )
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


_NEG = -1e30  # finite -inf stand-in, same as ops.pallas_attention._NEG


def _partial_softmax_spmm(scores, values, seg, num_nodes, mask, h, dh):
    """Unmerged online-softmax partial over one edge subset: per-node
    ``(acc, m, l)`` with ``acc = sum exp(s - m) * v`` (f32). Rows with no
    (unmasked) edges in the subset get ``m = -1e30, l = 0, acc = 0`` and
    drop out of the merge."""
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, _NEG)
    m = jax.ops.segment_max(scores, seg, num_segments=num_nodes)
    m = jnp.maximum(m, _NEG)  # empty rows: -inf -> finite floor
    p = jnp.exp(scores - jnp.take(m, seg, axis=0))
    if mask is not None:
        # a row whose subset edges are ALL masked has m == _NEG, so the
        # masked edges' exp(0) == 1 must be re-zeroed (as segment_softmax)
        p = jnp.where(mask[:, None], p, 0.0)
    l = jax.ops.segment_sum(p, seg, num_segments=num_nodes)  # [N, H]
    e = values.shape[0]
    v32 = values.astype(jnp.float32).reshape(e, h, dh)
    weighted = (v32 * p[:, :, None]).reshape(e, h * dh)
    acc = jax.ops.segment_sum(weighted, seg, num_segments=num_nodes)
    return acc, m, l


def _overlapped_partitioned_attention(
    q2, kv2, senders, receivers, num_nodes, edge_mask, scale,
    partition_axis, halo_send_idx, halo_dtype,
    csr_bounds, csr_bounds_halo, csr_max_chunks,
    num_local_edges, h, dh, scores_of, out_dtype,
):
    """Split-edge partitioned attention (``Graph.num_local_edges``): the
    local-edge partial softmax reads only this device's rows — NO collective
    in its data dependencies — while the halo-edge partial sits downstream
    of the O(boundary) ``all_to_all`` (``ops.halo.halo_recv``); the two
    merge with the online-softmax (m, l) combine. XLA's latency-hiding
    scheduler can therefore run the local partial (the bulk of the edges)
    UNDER the collective, instead of serializing every attention FLOP after
    it as the exchange-table gather does. Exactly equals the unsplit
    partitioned path up to fp reassociation (SURVEY §2.4 overlap item)."""
    d = h * dh
    nl = num_nodes
    el = num_local_edges
    s_loc, r_loc = senders[:el], receivers[:el]
    s_hal = senders[el:] - nl  # exchange-table halo region -> recv row ids
    r_hal = receivers[el:]
    m_loc = edge_mask[:el] if edge_mask is not None else None
    m_hal = edge_mask[el:] if edge_mask is not None else None

    # local partial inputs: independent of the collective
    q_loc = take_rows(q2, r_loc)
    kv_loc = take_rows(kv2, s_loc)
    scores_loc = scores_of(q_loc, kv_loc[:, :d])  # [El, H] f32

    # halo partial inputs: only these depend on the all_to_all
    recv = halo_recv(kv2, halo_send_idx, partition_axis, halo_dtype)
    q_hal = take_rows(q2, r_hal)
    kv_hal = take_rows(recv, s_hal)
    scores_hal = scores_of(q_hal, kv_hal[:, :d])  # [Eh, H] f32

    if csr_bounds is not None:
        # both slices receiver-sorted with their own kernel bounds: fused
        # Pallas softmax+SpMM per slice + exact (m, l) merge
        from graphphysics_tpu.ops.pallas_attention import (
            csr_softmax_spmm_pair,
        )

        seg_loc = r_loc.astype(jnp.int32)
        seg_hal = r_hal.astype(jnp.int32)
        v_loc, v_hal = kv_loc[:, d:], kv_hal[:, d:]
        if m_loc is not None:
            scores_loc = jnp.where(m_loc[:, None], scores_loc, _NEG)
            seg_loc = jnp.where(m_loc, seg_loc, num_nodes)
        if m_hal is not None:
            scores_hal = jnp.where(m_hal[:, None], scores_hal, _NEG)
            seg_hal = jnp.where(m_hal, seg_hal, num_nodes)
        out = csr_softmax_spmm_pair(
            scores_loc, v_loc, seg_loc, csr_bounds,
            scores_hal, v_hal, seg_hal, csr_bounds_halo,
            num_nodes, max_chunks=csr_max_chunks,
        )
        return out.reshape(num_nodes, h, dh).astype(out_dtype)

    acc_l, mx_l, l_l = _partial_softmax_spmm(
        scores_loc, kv_loc[:, d:], r_loc, num_nodes, m_loc, h, dh
    )
    acc_h, mx_h, l_h = _partial_softmax_spmm(
        scores_hal, kv_hal[:, d:], r_hal, num_nodes, m_hal, h, dh
    )
    mx = jnp.maximum(mx_l, mx_h)
    wl = jnp.exp(mx_l - mx)
    wh = jnp.exp(mx_h - mx)
    l = wl * l_l + wh * l_h  # [N, H]
    acc = (
        jnp.repeat(wl, dh, axis=1) * acc_l
        + jnp.repeat(wh, dh, axis=1) * acc_h
    )
    out = acc / (jnp.repeat(l, dh, axis=1) + 1e-16)
    return out.reshape(num_nodes, h, dh).astype(out_dtype)
