"""Locality-aware node reordering for edge-partitioned graphs.

``partition_graph_np`` cuts the node axis into contiguous equal blocks, so
the halo volume (boundary rows exchanged per layer, ``ops.halo``) is hostage
to the dataset's node numbering — a mesh numbered randomly makes every node a
boundary node. Reordering nodes by graph locality before partitioning shrinks
each part's surface:

- ``rcm``: reverse Cuthill-McKee on the symmetric mesh adjacency (scipy's
  C implementation) — minimizes bandwidth, so consecutive blocks share only a
  thin frontier. The default.
- ``bfs``: plain breadth-first order from node 0 — cheaper, slightly weaker.
- ``hilbert``: Morton (Z-order) code on quantized ``pos`` — topology-free,
  works even when the edge list is expensive to assemble host-side, and
  extends to world-edge graphs whose adjacency changes per frame.

Training is node-permutation-equivariant (losses, gradients, and normalizer
statistics are masked sums), so a reordered partitioned step reproduces the
unreordered one exactly up to fp reduction order; node-wise OUTPUTS (rollout
predictions) must be mapped back with ``inverse_permutation``.

The reference has no analog (it never partitions a graph; SURVEY.md §2.4);
this is TPU-native design for the halo-exchange training mode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from graphphysics_tpu.core.graph import Graph


def locality_permutation(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_mask: Optional[np.ndarray] = None,
    pos: Optional[np.ndarray] = None,
    method: str = "rcm",
) -> np.ndarray:
    """Permutation ``perm`` (``perm[new] = old``) ordering nodes by locality.

    Masked (padding) edges contribute no adjacency; isolated nodes (incl.
    padding nodes) keep a stable relative order at wherever the method
    places them — the permutation is always a bijection on ``num_nodes``.
    """
    if method == "hilbert":
        if pos is None:
            raise ValueError("hilbert reordering needs node positions")
        return _morton_permutation(np.asarray(pos), num_nodes)

    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    if edge_mask is not None:
        m = np.asarray(edge_mask)
        s, r = s[m], r[m]
    from scipy import sparse
    from scipy.sparse import csgraph

    data = np.ones(len(s), np.int8)
    adj = sparse.coo_matrix(
        (data, (s, r)), shape=(num_nodes, num_nodes)
    ).tocsr()
    adj = (adj + adj.T).tocsr()  # symmetrize: both methods want undirected

    if method == "rcm":
        perm = csgraph.reverse_cuthill_mckee(adj, symmetric_mode=True)
        return np.asarray(perm, np.int64)
    if method == "bfs":
        order, _ = csgraph.breadth_first_order(
            adj, 0, directed=False, return_predecessors=True
        )
        seen = np.zeros(num_nodes, bool)
        seen[order] = True
        rest = np.flatnonzero(~seen)  # unreachable components, in index order
        return np.concatenate([order, rest]).astype(np.int64)
    raise ValueError(f"unknown reorder method {method!r}")


def _morton_permutation(pos: np.ndarray, num_nodes: int) -> np.ndarray:
    """Z-order (Morton) sort of quantized positions — a cheap Hilbert-curve
    stand-in with the same asymptotic locality."""
    p = pos[:num_nodes].astype(np.float64)
    lo, hi = p.min(axis=0), p.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    bits = 16 // p.shape[1] * 2  # 16 bits for 2D, 10 for 3D
    q = np.clip(((p - lo) / span * ((1 << bits) - 1)).astype(np.uint64),
                0, (1 << bits) - 1)
    code = np.zeros(num_nodes, np.uint64)
    for b in range(bits):
        for d in range(p.shape[1]):
            code |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * p.shape[1] + d
            )
    return np.argsort(code, kind="stable").astype(np.int64)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    """``inv`` with ``inv[old] = new``: maps node-wise outputs of a permuted
    graph back to the original order (``out_orig = out_perm[inv]``)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def permute_graph_np(graph: Graph, perm: np.ndarray) -> Graph:
    """Reorder a Graph's node rows so new row ``i`` is old row ``perm[i]``;
    edge endpoints are relabeled accordingly (edge order unchanged). Any
    attached CSR bounds are dropped — they describe the old sender sort;
    the partitioner recomputes per-part bounds itself."""
    inv = inverse_permutation(np.asarray(perm))

    def rows(a):
        return None if a is None else np.asarray(a)[perm]

    return graph.replace(
        x=rows(graph.x),
        pos=rows(graph.pos),
        senders=inv[np.asarray(graph.senders)].astype(np.int32),
        receivers=inv[np.asarray(graph.receivers)].astype(np.int32),
        node_mask=rows(graph.node_mask),
        y=rows(graph.y),
        exclude_mask=rows(graph.exclude_mask),
        csr_bounds=None,
        csr_max_chunks=None,
    )


def halo_volume(graph: Graph, num_parts: int) -> dict:
    """Comms-cost proxy of halo-partitioning ``graph`` into ``num_parts``
    contiguous blocks (hardware-independent; the VERDICT/BASELINE scaling
    stat): boundary rows shipped per message-passing layer. ``real`` counts
    distinct requested rows (the information-theoretic minimum); ``budgeted``
    counts the uniform-budget all_to_all slots actually transferred
    (``(P-1) * B`` per device, ``B`` = max pairwise boundary rounded up)."""
    from graphphysics_tpu.core.graph import round_up
    from graphphysics_tpu.parallel.graph_partition import _halo_requests

    n = graph.num_nodes
    if n % num_parts != 0:
        # matches partition_graph_np's check: receivers // nl would map
        # past the last part and silently underreport the proxy otherwise
        raise ValueError(
            f"num_nodes {n} not divisible by num_parts {num_parts}"
        )
    nl = n // num_parts
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    edge_mask = np.asarray(graph.edge_mask)
    requests, max_req = _halo_requests(
        senders, receivers // nl, edge_mask, nl, num_parts
    )
    real = sum(
        len(requests[p][q])
        for p in range(num_parts)
        for q in range(num_parts)
        if q != p
    )
    b = max(8, round_up(max_req, 8))
    budgeted = num_parts * (num_parts - 1) * b
    return {
        "parts": num_parts,
        "halo_budget": b,
        "rows_exchanged_budgeted": budgeted,
        "rows_exchanged_real": real,
        "rows_total": n,
        "budgeted_fraction": budgeted / n,
        "real_fraction": real / n,
    }
