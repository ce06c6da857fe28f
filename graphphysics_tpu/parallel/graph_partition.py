"""Edge-partitioned graph parallelism — the "sequence parallelism" of mesh
GNNs (SURVEY.md §2.4 north star; the reference has no distributed support).

A single large mesh graph is partitioned across a ``graph`` mesh axis:

- nodes split into contiguous equal blocks (one per device) — node features,
  targets, masks, and normalizer statistics are all local rows;
- every directed edge lives on the device owning its SEGMENT node (the
  receiver; for the transformer path the dataset emits the transposed edge
  list, valid on the symmetric mesh adjacency), so segment reductions and
  softmaxes are conflict-free local ops;
- the only communication is per message-passing layer, for the
  ``x[senders]`` gather: an ``all_gather`` of the node-feature table
  (backward: ``reduce_scatter``) with ``partition_graph_np``, or an
  ``all_to_all`` of precomputed boundary rows (``ops.halo``) with
  ``partition_graph_halo_np`` — either way riding ICI.

The model code is unchanged: a Graph whose static ``partition_axis`` is set
routes the gather through the collective (see ``models.layers``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from graphphysics_tpu.core.graph import Graph, round_up
from graphphysics_tpu.parallel.mesh import GRAPH_AXIS


def _part_edge_idx(
    edge_mask: np.ndarray,
    part_of_edge: np.ndarray,
    receivers: np.ndarray,
    p: int,
    csr: bool,
) -> np.ndarray:
    """Indices of part ``p``'s real edges, in the canonical per-part order:
    input order for COO, stable-sorted by (local) receiver for CSR — the
    softmax/segment key of the partitioned convention, which the fused
    Pallas kernel streams block-contiguously. Shared by the base partitioner
    and the halo sender remap so row ``i`` always describes the same edge."""
    idx = np.flatnonzero(edge_mask & (part_of_edge == p))
    if csr:
        idx = idx[np.argsort(receivers[idx], kind="stable")]
    return idx


def partition_graph_np(
    graph: Graph,
    num_parts: int,
    axis_name: str = GRAPH_AXIS,
    edge_multiple: int = 128,
    edge_budget_local: Optional[int] = None,
    csr: bool = False,
) -> Graph:
    """Partition an unpartitioned COO Graph into ``num_parts`` shards stacked
    on a new leading axis (shard with ``P(axis_name)`` over the mesh).

    Node count must divide evenly (budgets are 128-multiples, so pick
    ``num_parts`` accordingly). Edges go to the part owning their receiver;
    per-part edge arrays are padded to the max part size.

    ``csr=True`` additionally sorts each part's edges by LOCAL receiver (the
    partitioned softmax segment) and attaches per-part ``csr_bounds``
    (stacked ``[P, 2, NB]``) + the static ``csr_max_chunks`` so transformer
    attention runs the fused Pallas softmax+SpMM kernel on each device's
    local block (``ops.pallas_attention``) — composing the two large-mesh
    features. Any ``csr_bounds`` on the input (single-chip sender-sorted
    layout) are recomputed for the per-part convention.
    """
    if graph.partition_axis is not None:
        raise ValueError("graph is already partitioned")
    if graph.ell_degree is not None:
        raise ValueError("partitioning expects the COO layout")
    n = graph.num_nodes
    if n % num_parts:
        raise ValueError(f"num_nodes {n} not divisible by {num_parts} parts")
    nl = n // num_parts

    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    edge_mask = np.asarray(graph.edge_mask)
    part_of_edge = receivers // nl

    # budget & assign REAL edges only: the input's padding edges all point
    # at the global last node, which would land them in the last part and
    # inflate the uniform budget for every part (padding is regenerated
    # per part below)
    counts = np.bincount(part_of_edge[edge_mask], minlength=num_parts)
    el = edge_budget_local or round_up(int(counts.max()), edge_multiple)
    if counts.max() > el:
        raise ValueError(
            f"edge_budget_local {el} < max part edges {int(counts.max())}"
        )

    def node_field(a):
        if a is None:
            return None
        return np.asarray(a).reshape((num_parts, nl) + np.asarray(a).shape[1:])

    s_p = np.zeros((num_parts, el), np.int32)
    r_p = np.zeros((num_parts, el), np.int32)
    m_p = np.zeros((num_parts, el), bool)
    ea_p = None
    if graph.edge_attr is not None:
        ea = np.asarray(graph.edge_attr)
        ea_p = np.zeros((num_parts, el, ea.shape[1]), ea.dtype)
    bounds_p = None
    max_chunks = None
    if csr:
        from graphphysics_tpu.ops.pallas_attention import (
            compute_block_bounds,
            compute_max_chunks_bounds,
        )
    for p in range(num_parts):
        idx = _part_edge_idx(edge_mask, part_of_edge, receivers, p, csr)
        k = len(idx)
        # padding edges: self-loop on the part's last (global) node —
        # receiver nl-1 also keeps the CSR receiver sort ascending end-to-end
        s_p[p] = p * nl + nl - 1
        r_p[p] = nl - 1
        s_p[p, :k] = senders[idx]
        r_p[p, :k] = receivers[idx] - p * nl
        m_p[p, :k] = True
        if ea_p is not None:
            ea_p[p, :k] = ea[idx]
        if csr:
            b = compute_block_bounds(r_p[p], nl, num_real_edges=k)
            mc = compute_max_chunks_bounds(b)
            if bounds_p is None:
                bounds_p = np.zeros((num_parts,) + b.shape, np.int32)
            bounds_p[p] = b
            max_chunks = mc if max_chunks is None else max(max_chunks, mc)

    return Graph(
        x=node_field(graph.x),
        pos=node_field(graph.pos),
        senders=s_p,
        receivers=r_p,
        edge_attr=ea_p,
        node_mask=node_field(graph.node_mask),
        edge_mask=m_p,
        y=node_field(graph.y),
        exclude_mask=node_field(graph.exclude_mask),
        partition_axis=axis_name,
        csr_bounds=bounds_p,
        csr_max_chunks=max_chunks,
    )


def _halo_requests(senders_g, part_of_edge, edge_mask_g, nl, num_parts):
    """requests[p][q]: sorted unique LOCAL row ids of part ``q`` needed by
    part ``p`` (q != p); also returns the max request length. Masked edges
    contribute no requests (their senders may be arbitrary)."""
    requests = [[np.empty(0, np.int64)] * num_parts for _ in range(num_parts)]
    max_req = 0
    for p in range(num_parts):
        s_glob = senders_g[(part_of_edge == p) & edge_mask_g]
        owners = s_glob // nl
        for q in range(num_parts):
            if q == p:
                continue
            uniq = np.unique(s_glob[owners == q] - q * nl)
            requests[p][q] = uniq
            max_req = max(max_req, len(uniq))
    return requests, max_req



def _halo_budget_and_send(
    requests, max_req, num_parts, halo_multiple, halo_budget
):
    """Uniform halo budget + the [P, P, B] send table (row [q, p] = local
    rows device q sends to device p) — shared by the plain and split-edge
    halo partitioners so their exchange conventions cannot drift."""
    b = halo_budget or max(halo_multiple, round_up(max_req, halo_multiple))
    if max_req > b:
        raise ValueError(f"halo_budget {b} < max boundary rows {max_req}")
    halo_send = np.zeros((num_parts, num_parts, b), np.int32)
    for p in range(num_parts):
        for q in range(num_parts):
            req = requests[p][q]
            halo_send[q, p, : len(req)] = req
    return b, halo_send


def partition_graph_halo_np(
    graph: Graph,
    num_parts: int,
    axis_name: str = GRAPH_AXIS,
    edge_multiple: int = 128,
    edge_budget_local=None,
    halo_multiple: int = 8,
    halo_budget: Optional[int] = None,
    csr: bool = False,
    split_local: bool = False,
    _requests=None,
) -> Graph:
    """Partition with HALO exchange: like ``partition_graph_np`` but senders
    are pre-remapped into the per-device exchange table and ``halo_send_idx``
    carries the boundary-row send lists, so per-layer communication is an
    ``all_to_all`` of boundary rows instead of a full-table ``all_gather``
    (``ops.halo``). Volume: the exchange is uniform-budget, so each device
    ships ``(P-1) * B * F`` per layer where ``B`` is the max boundary between
    any pair — for contiguously-numbered mesh partitions that is
    O(max surface) per peer, still far below the all_gather's
    ``(P-1)/P * N * F`` whenever boundaries are small vs parts.

    ``halo_send_idx`` is ``[P, P, B]`` stacked on the device axis: row
    ``[q, p]`` = local rows device ``q`` sends to device ``p``.

    ``csr=True`` composes halo exchange with the fused Pallas attention
    kernel: per-part receiver-sorted edges + per-part ``csr_bounds`` (see
    ``partition_graph_np``), with the remapped senders following the same
    per-part edge order.

    ``split_local=True`` lays each part's edges out ``[local | halo]``
    (``Graph.num_local_edges``): slots whose sender is a local row come
    first, edges needing halo rows after — each slice receiver-sorted (and
    with its own kernel bounds) under ``csr``. Attention then computes the
    local partial softmax independently of the ``all_to_all`` and merges
    online-softmax stats (``ops.attention``), so XLA can overlap the
    collective with the local attention compute. ``edge_budget_local`` is
    then a ``(local, halo)`` pair of per-part slot budgets.
    """
    if split_local:
        return _partition_halo_split(
            graph, num_parts, axis_name, edge_multiple, edge_budget_local,
            halo_multiple, halo_budget, csr, _requests,
        )
    base = partition_graph_np(
        graph, num_parts, axis_name, edge_multiple, edge_budget_local, csr=csr
    )
    n = graph.num_nodes
    nl = n // num_parts
    p_arr = num_parts

    senders_g = np.asarray(graph.senders)
    receivers_g = np.asarray(graph.receivers)
    edge_mask_g = np.asarray(graph.edge_mask)
    part_of_edge = receivers_g // nl

    if _requests is not None:
        requests, max_req = _requests
    else:
        requests, max_req = _halo_requests(
            senders_g, part_of_edge, edge_mask_g, nl, p_arr
        )
    b, halo_send = _halo_budget_and_send(
        requests, max_req, p_arr, halo_multiple, halo_budget
    )

    # remap each part's senders: local -> local id; remote (owner q, request
    # slot r) -> nl + q*b + r; masked and padding slots -> the part's last
    # local row (any in-range value works — they are excluded by edge_mask).
    s_new = np.full(base.senders.shape, nl - 1, np.int32)
    for p in range(p_arr):
        # same real-edge filter and ordering as partition_graph_np (incl.
        # the CSR receiver sort), so row i of s_new[p] describes the same
        # edge as row i of base.senders[p]
        idx = _part_edge_idx(edge_mask_g, part_of_edge, receivers_g, p, csr)
        k = len(idx)
        s_glob = senders_g[idx]
        owners = s_glob // nl
        local = (s_glob - owners * nl).astype(np.int64)
        out = np.full(k, nl - 1, np.int32)
        own = owners == p
        out[own] = local[own]
        for q in range(p_arr):
            if q == p:
                continue
            sel = owners == q
            if not sel.any():
                continue
            slots = np.searchsorted(requests[p][q], local[sel])
            out[sel] = nl + q * b + slots
        s_new[p, :k] = out

    return base.replace(senders=s_new, halo_send_idx=halo_send)


def _partition_halo_split(
    graph: Graph,
    num_parts: int,
    axis_name: str,
    edge_multiple: int,
    edge_budget_local,
    halo_multiple: int,
    halo_budget: Optional[int],
    csr: bool,
    _requests,
) -> Graph:
    """``partition_graph_halo_np(split_local=True)`` body: the ``[local |
    halo]`` split-edge layout (see that docstring). Built directly rather
    than by remapping ``partition_graph_np``'s output because the edge
    ORDER differs (two separately-sorted slices instead of one)."""
    if graph.partition_axis is not None:
        raise ValueError("graph is already partitioned")
    if graph.ell_degree is not None:
        raise ValueError("partitioning expects the COO layout")
    n = graph.num_nodes
    if n % num_parts:
        raise ValueError(f"num_nodes {n} not divisible by {num_parts} parts")
    nl = n // num_parts

    senders_g = np.asarray(graph.senders)
    receivers_g = np.asarray(graph.receivers)
    edge_mask_g = np.asarray(graph.edge_mask)
    part_of_edge = receivers_g // nl

    if _requests is not None:
        requests, max_req = _requests
    else:
        requests, max_req = _halo_requests(
            senders_g, part_of_edge, edge_mask_g, nl, num_parts
        )
    b, halo_send = _halo_budget_and_send(
        requests, max_req, num_parts, halo_multiple, halo_budget
    )

    # per-part (local, halo) edge index lists, each in the canonical slice
    # order (receiver-sorted under csr, input order otherwise)
    locs, hals = [], []
    for p in range(num_parts):
        idx = np.flatnonzero(edge_mask_g & (part_of_edge == p))
        owners = senders_g[idx] // nl
        loc, hal = idx[owners == p], idx[owners != p]
        if csr:
            loc = loc[np.argsort(receivers_g[loc], kind="stable")]
            hal = hal[np.argsort(receivers_g[hal], kind="stable")]
        locs.append(loc)
        hals.append(hal)

    if edge_budget_local is not None:
        el, eh = edge_budget_local
    else:
        el = round_up(max(len(l) for l in locs), edge_multiple)
        eh = round_up(
            max(max(len(h) for h in hals), 1), edge_multiple
        )
    if max(len(l) for l in locs) > el or max(len(h) for h in hals) > eh:
        raise ValueError(
            f"edge budgets (local {el}, halo {eh}) < max part edges "
            f"({max(len(l) for l in locs)}, {max(len(h) for h in hals)})"
        )
    e_tot = el + eh

    def node_field(a):
        if a is None:
            return None
        a = np.asarray(a)
        return a.reshape((num_parts, nl) + a.shape[1:])

    s_p = np.zeros((num_parts, e_tot), np.int32)
    r_p = np.full((num_parts, e_tot), nl - 1, np.int32)
    m_p = np.zeros((num_parts, e_tot), bool)
    ea = None if graph.edge_attr is None else np.asarray(graph.edge_attr)
    ea_p = (
        None
        if ea is None
        else np.zeros((num_parts, e_tot, ea.shape[1]), ea.dtype)
    )
    bounds_loc = bounds_hal = None
    max_chunks = None
    if csr:
        from graphphysics_tpu.ops.pallas_attention import (
            compute_block_bounds,
            compute_max_chunks_bounds,
        )
    for p in range(num_parts):
        loc, hal = locs[p], hals[p]
        kl, kh = len(loc), len(hal)
        # local slice: senders are LOCAL row ids; padding is a self-loop on
        # the part's last local row (mask-excluded; keeps the CSR receiver
        # sort ascending)
        s_p[p, :el] = nl - 1
        s_p[p, :kl] = senders_g[loc] - p * nl
        r_p[p, :kl] = receivers_g[loc] - p * nl
        m_p[p, :kl] = True
        # halo slice: senders index the exchange table's halo region
        # (nl + q*b + request slot); padding points at the first halo row
        # (any in-range value — excluded by edge_mask)
        s_p[p, el:] = nl
        s_glob = senders_g[hal]
        owners = s_glob // nl
        local = (s_glob - owners * nl).astype(np.int64)
        out = np.full(kh, nl, np.int32)
        for q in range(num_parts):
            if q == p:
                continue
            sel = owners == q
            if not sel.any():
                continue
            slots = np.searchsorted(requests[p][q], local[sel])
            out[sel] = nl + q * b + slots
        s_p[p, el : el + kh] = out
        r_p[p, el : el + kh] = receivers_g[hal] - p * nl
        m_p[p, el : el + kh] = True
        if ea_p is not None:
            ea_p[p, :kl] = ea[loc]
            ea_p[p, el : el + kh] = ea[hal]
        if csr:
            bl = compute_block_bounds(r_p[p, :el], nl, num_real_edges=kl)
            bh = compute_block_bounds(r_p[p, el:], nl, num_real_edges=kh)
            mc = max(
                compute_max_chunks_bounds(bl), compute_max_chunks_bounds(bh)
            )
            if bounds_loc is None:
                bounds_loc = np.zeros((num_parts,) + bl.shape, np.int32)
                bounds_hal = np.zeros((num_parts,) + bh.shape, np.int32)
            bounds_loc[p] = bl
            bounds_hal[p] = bh
            max_chunks = mc if max_chunks is None else max(max_chunks, mc)

    return Graph(
        x=node_field(graph.x),
        pos=node_field(graph.pos),
        senders=s_p,
        receivers=r_p,
        edge_attr=ea_p,
        node_mask=node_field(graph.node_mask),
        edge_mask=m_p,
        y=node_field(graph.y),
        exclude_mask=node_field(graph.exclude_mask),
        partition_axis=axis_name,
        halo_send_idx=halo_send,
        csr_bounds=bounds_loc,
        csr_bounds_halo=bounds_hal,
        csr_max_chunks=max_chunks,
        num_local_edges=el,
    )


def unpartition_rows(stacked: np.ndarray) -> np.ndarray:
    """[P, Nl, ...] node-wise output back to [N, ...] (parts are contiguous)."""
    a = np.asarray(stacked)
    return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])


def partition_frames_np(
    frames: list,
    num_parts: int,
    axis_name: str = GRAPH_AXIS,
    halo: bool = False,
    csr: bool = False,
    split_local: bool = False,
):
    """Partition every frame of a trajectory identically and stack to leaves
    ``[T, P, ...]`` — the input to ``parallel.dp.partitioned_rollout``.

    Frames share the node split; the per-part edge budget (and, with
    ``halo=True``, the halo budget) is the max over frames so all frames
    share one static shape (world edges may differ per frame). ``csr=True``
    attaches per-part kernel bounds, with the static ``csr_max_chunks``
    normalized to the max over frames so the stacked pytree (and the one
    compiled rollout scan) is uniform. ``split_local=True`` (halo only)
    uses the ``[local | halo]`` overlap layout with (local, halo) slice
    budgets maxed over frames."""
    from graphphysics_tpu.core.graph import round_up as _ru

    nl = frames[0].num_nodes // num_parts
    if split_local and not halo:
        raise ValueError("split_local requires halo=True")
    budget = 0
    el_max = eh_max = 0
    for f in frames:
        em = np.asarray(f.edge_mask)
        part = (np.asarray(f.receivers) // nl)[em]
        counts = np.bincount(part, minlength=num_parts)
        budget = max(budget, _ru(int(counts.max()), 128))
        if split_local:
            owner = (np.asarray(f.senders) // nl)[em]
            loc = np.bincount(part[owner == part], minlength=num_parts)
            hal = np.bincount(part[owner != part], minlength=num_parts)
            el_max = max(el_max, _ru(int(loc.max()), 128))
            eh_max = max(eh_max, _ru(max(int(hal.max()), 1), 128))
    if halo:
        per_frame = []
        halo_b = 8
        for f in frames:
            part_of_edge = np.asarray(f.receivers) // nl
            req = _halo_requests(
                np.asarray(f.senders), part_of_edge,
                np.asarray(f.edge_mask), nl, num_parts,
            )
            per_frame.append(req)
            halo_b = max(halo_b, _ru(req[1], 8))
        eb = (el_max, eh_max) if split_local else budget
        parts = [
            partition_graph_halo_np(
                f, num_parts, axis_name,
                edge_budget_local=eb, halo_budget=halo_b, csr=csr,
                split_local=split_local, _requests=req,
            )
            for f, req in zip(frames, per_frame)
        ]
    else:
        parts = [
            partition_graph_np(
                f, num_parts, axis_name, edge_budget_local=budget, csr=csr
            )
            for f in frames
        ]
    if csr:
        mc = max(p.csr_max_chunks for p in parts)
        parts = [p.replace(csr_max_chunks=mc) for p in parts]
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *parts)
