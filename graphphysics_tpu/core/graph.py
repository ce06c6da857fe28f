"""Static-shape graph containers.

The TPU-first analog of the reference's dynamic PyG ``Data`` objects
(``graphphysics/utils/torch_graph.py:115-195``): a flat struct-of-arrays pytree
with *padded, static* node/edge counts so that every model step compiles once
per bucket. Padding is tracked with boolean validity masks; padded nodes carry
``NodeType.PADDING`` and padded edges connect the last (padding) node to itself
and are masked out of every aggregation, softmax, loss, and statistic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


_META_FIELDS = (
    "ell_degree",
    "partition_axis",
    "csr_max_chunks",
    "halo_dtype",
    "num_local_edges",
)


def _dc(cls):
    fields = [
        f.name for f in dataclasses.fields(cls) if f.name not in _META_FIELDS
    ]
    meta = [f.name for f in dataclasses.fields(cls) if f.name in _META_FIELDS]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=meta
    )


@_dc
@dataclasses.dataclass(frozen=True)
class Graph:
    """A (possibly padded) mesh graph.

    Attributes:
        x: ``[N, F]`` raw node features, laid out per the dataset config
            (dynamic fields, node_type column, time column, ...).
        pos: ``[N, D]`` mesh positions (D = 2 or 3).
        senders: ``[E]`` int32 edge sources (``edge_index[0]`` in the reference).
        receivers: ``[E]`` int32 edge targets (``edge_index[1]``).
        edge_attr: ``[E, Fe]`` edge features or None.
        node_mask: ``[N]`` bool, True for real (non-padding) nodes.
        edge_mask: ``[E]`` bool, True for real (non-padding) edges.
        y: ``[N, Fo]`` target features (next-frame dynamic fields) or None.
        exclude_mask: ``[N]`` bool or None; True for nodes excluded from the
            loss (the MeshMask ``selected_indexes`` of the reference,
            ``graphphysics/utils/loss.py:10-25``).
        twin_perm: ``[E]`` int32 or None (ELL layout): slot index of the
            reversed edge — lets gather backward run as gather+dense-reduce.
        ell_degree: static; if set, edges are in fixed-degree ELL layout —
            slot ``e`` belongs to owner node ``e // ell_degree`` and
            ``receivers[e] == e // ell_degree`` (see ``topology.ell``).
        partition_axis: static; if set (edge-partitioned multi-chip graph,
            ``parallel.graph_partition``), this Graph holds one device's
            shard inside ``shard_map`` over that mesh axis: node arrays are
            LOCAL rows, ``receivers`` are LOCAL indices (the segment side),
            ``senders`` are GLOBAL indices into the all-gathered node table —
            unless ``halo_send_idx`` is set (halo mode, below).
        halo_send_idx: ``[P, B]`` int32 or None. Halo-exchange mode for
            partitioned graphs (``parallel.partition_graph_halo_np``): row
            ``q`` holds the LOCAL indices of the boundary rows this device
            must send to peer ``q`` (padded with 0). When set, ``senders``
            are LOCAL indices into the exchange table
            ``[local rows ; halo rows]`` (see ``ops.halo``) and per-layer
            communication is an ``all_to_all`` of O(boundary) rows instead
            of an ``all_gather`` of the full node table.
        csr_bounds: ``[2, num_blocks]`` int32 or None. CSR layout for the
            fused Pallas attention kernel (``ops.pallas_attention``): edges
            are SORTED by sender and ``csr_bounds`` gives each BLOCK_NODES-node
            block's [start, end) edge range (``compute_block_bounds``) —
            trailing padding edges are excluded, and concat-batched graphs'
            ranges skip each member's padding. Requires the node count to be
            a multiple of the kernel block size.
        csr_max_chunks: static; the busiest block's chunk budget for the CSR
            kernel grid (same for every sample of a dataset so the step
            compiles once).
        halo_dtype: static; wire dtype for the per-layer halo exchange
            ("bf16" halves the all_to_all bytes — the dominant multi-chip
            comms term; local math stays in the compute dtype, and the
            backward cotangent ships 16-bit too). None = exchange in the
            activations' own dtype.
        csr_bounds_halo: like ``csr_bounds`` but for the HALO slice of a
            split-edge partitioned graph (below), with offsets relative to
            the slice start.
        num_local_edges: static; if set (halo-partitioned graphs built with
            ``split_local=True``), the edge arrays are laid out
            ``[local edges | halo edges]``: slots ``[0, num_local_edges)``
            hold edges whose sender is a LOCAL row (ids < Nl) and the rest
            hold edges whose sender lives in the exchange-table halo region
            (ids >= Nl). Attention then computes the local partial softmax
            INDEPENDENTLY of the halo ``all_to_all`` and merges online-
            softmax stats, letting XLA overlap the collective with local
            compute (``ops.attention``).
    """

    x: jax.Array
    pos: jax.Array
    senders: jax.Array
    receivers: jax.Array
    edge_attr: Optional[jax.Array]
    node_mask: jax.Array
    edge_mask: jax.Array
    y: Optional[jax.Array]
    exclude_mask: Optional[jax.Array] = None
    twin_perm: Optional[jax.Array] = None
    halo_send_idx: Optional[jax.Array] = None
    csr_bounds: Optional[jax.Array] = None
    ell_degree: Optional[int] = None
    partition_axis: Optional[str] = None
    csr_max_chunks: Optional[int] = None
    halo_dtype: Optional[str] = None
    csr_bounds_halo: Optional[jax.Array] = None
    num_local_edges: Optional[int] = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[-2]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[-1]

    def replace(self, **kw: Any) -> "Graph":
        return dataclasses.replace(self, **kw)


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` that is >= n."""
    return ((n + multiple - 1) // multiple) * multiple


def bucket_size(n: int, multiple: int, growth: float = 1.0) -> int:
    """Pick a padded size for ``n``: round up to ``multiple``, optionally with
    geometric headroom (``growth > 1``) so nearby sizes share one bucket and
    one compiled executable."""
    if growth > 1.0:
        m = multiple
        while m < n:
            m = round_up(int(np.ceil(m * growth)), multiple)
        return max(m, multiple)
    return round_up(max(n, 1), multiple)


def pad_graph_np(
    x: np.ndarray,
    pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    e_pad: int,
    edge_attr: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    node_type_index: Optional[int] = None,
    padding_node_type: int = 8,
) -> Graph:
    """Host-side (numpy) padding of a raw graph to static sizes.

    Padded edges are self-loops on the last node (a padding node whenever
    ``n_pad > N``) so scatter targets stay in range; all padded entries are
    masked. If ``node_type_index`` is given, padded nodes get
    ``padding_node_type`` in that feature column so their one-hot is distinct.
    """
    n, e = x.shape[0], senders.shape[0]
    if n_pad < n or e_pad < e:
        raise ValueError(f"pad sizes too small: nodes {n}->{n_pad}, edges {e}->{e_pad}")

    def pad_rows(a: Optional[np.ndarray], rows: int) -> Optional[np.ndarray]:
        if a is None:
            return None
        out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    x_p = pad_rows(x.astype(np.float32), n_pad)
    if node_type_index is not None and n_pad > n:
        x_p[n:, node_type_index] = padding_node_type
    pos_p = pad_rows(pos.astype(np.float32), n_pad)
    dummy = n_pad - 1
    s_p = np.full((e_pad,), dummy, dtype=np.int32)
    r_p = np.full((e_pad,), dummy, dtype=np.int32)
    s_p[:e] = senders
    r_p[:e] = receivers
    ea_p = pad_rows(None if edge_attr is None else edge_attr.astype(np.float32), e_pad)
    y_p = pad_rows(None if y is None else y.astype(np.float32), n_pad)
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_mask[:n] = True
    edge_mask = np.zeros((e_pad,), dtype=bool)
    edge_mask[:e] = True
    return Graph(
        x=x_p,
        pos=pos_p,
        senders=s_p,
        receivers=r_p,
        edge_attr=ea_p,
        node_mask=node_mask,
        edge_mask=edge_mask,
        y=y_p,
    )


def pad_graph_csr_np(
    x: np.ndarray,
    pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    e_pad: int,
    edge_attr: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    node_type_index: Optional[int] = None,
    block_nodes: Optional[int] = None,
) -> Graph:
    """``pad_graph_np`` with the edge list sorted by sender (stable) and the
    per-block CSR [start, end) ranges of the fused Pallas attention kernel
    attached (``ops.pallas_attention``). Padded edges (sender = last node)
    sort after every real edge and the block ranges CLAMP before them, so
    padding is never streamed by the kernel (its chunk budget therefore
    depends only on the real-edge distribution, not on how much a small
    sample is padded). ``n_pad`` must be a multiple of the kernel's
    node-block size."""
    from graphphysics_tpu.ops.pallas_attention import (
        BLOCK_NODES,
        compute_block_bounds,
        compute_max_chunks_bounds,
    )

    bn = block_nodes or BLOCK_NODES
    if n_pad % bn:
        raise ValueError(
            f"CSR layout requires node padding {n_pad} to be a multiple of "
            f"the kernel block ({bn}); round the node budget up"
        )
    order = np.argsort(senders, kind="stable")
    g = pad_graph_np(
        x,
        pos,
        np.asarray(senders)[order],
        np.asarray(receivers)[order],
        n_pad,
        e_pad,
        edge_attr=None if edge_attr is None else np.asarray(edge_attr)[order],
        y=y,
        node_type_index=node_type_index,
    )
    bounds = compute_block_bounds(
        np.asarray(g.senders), n_pad, num_real_edges=len(senders), block_nodes=bn
    )
    return g.replace(
        csr_bounds=bounds, csr_max_chunks=compute_max_chunks_bounds(bounds)
    )


def stack_graphs(graphs: list) -> Graph:
    """Stack same-shape Graphs along a new leading batch axis (host or device).

    The TPU batching analog of PyG's concat-batching: shapes stay static and
    the batch axis is the natural data-parallel sharding axis.
    """
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *graphs)


def pad_graph_ell_np(
    x: np.ndarray,
    pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    n_pad: int,
    degree: int,
    edge_attr: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    node_type_index: Optional[int] = None,
    padding_node_type: int = 8,
) -> Graph:
    """Host-side padding into the fixed-degree ELL layout (``topology.ell``):
    nodes pad to ``n_pad``, edges group by receiver into ``degree`` slots per
    node (edge count = ``n_pad * degree``). Requires a symmetric edge list."""
    from graphphysics_tpu.topology.ell import build_ell

    n = x.shape[0]
    if n_pad < n:
        raise ValueError(f"pad size too small: nodes {n}->{n_pad}")

    ell = build_ell(senders, receivers, n_pad, degree=degree)

    def pad_rows(a: Optional[np.ndarray], rows: int) -> Optional[np.ndarray]:
        if a is None:
            return None
        out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    x_p = pad_rows(x.astype(np.float32), n_pad)
    if node_type_index is not None and n_pad > n:
        x_p[n:, node_type_index] = padding_node_type
    ea_p = None
    if edge_attr is not None:
        ea_p = np.zeros((n_pad * degree, edge_attr.shape[1]), np.float32)
        ea_p[ell.edge_mask] = edge_attr[ell.edge_perm[ell.edge_mask]]
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_mask[:n] = True
    return Graph(
        x=x_p,
        pos=pad_rows(pos.astype(np.float32), n_pad),
        senders=ell.senders,
        receivers=ell.receivers,
        edge_attr=ea_p,
        node_mask=node_mask,
        edge_mask=ell.edge_mask,
        y=pad_rows(None if y is None else y.astype(np.float32), n_pad),
        twin_perm=ell.twin_perm,
        ell_degree=degree,
    )


def flatten_batched_graph(g: Graph) -> "Graph":
    """Device-side (jnp, jit-friendly) flattening of a stacked batch
    ``[B, N, ...]`` into one concat graph ``[B*N, ...]`` with offset edge
    indices — the in-jit twin of ``concat_graphs`` used inside ``shard_map``
    so each device flattens only its local shard."""
    import jax.numpy as jnp

    if g.halo_send_idx is not None:
        raise ValueError(
            "flatten_batched_graph: halo-partitioned graphs (halo_send_idx "
            "set) use exchange-table-local senders and cannot be flattened; "
            "feed them to the graph-parallel step instead"
        )
    b, n = g.x.shape[0], g.x.shape[1]

    def flat(a):
        if a is None:
            return None
        return a.reshape((b * a.shape[1],) + a.shape[2:])

    offsets = (jnp.arange(b, dtype=g.senders.dtype) * n)[:, None]
    twin_perm = None
    if g.twin_perm is not None:
        e = g.twin_perm.shape[1]
        e_offsets = (jnp.arange(b, dtype=g.twin_perm.dtype) * e)[:, None]
        twin_perm = (g.twin_perm + e_offsets).reshape(-1)
    flat_senders = (g.senders + offsets).reshape(-1)
    csr_bounds = None
    csr_max_chunks = None
    if g.csr_bounds is not None:
        # exact shift-merge (see concat_graphs): graph i's [start, end)
        # ranges move by i*E in the flattened edge array; clamped ends keep
        # padding out. +1 chunk only when a shift can realign BE windows.
        e = g.senders.shape[1]
        e_offsets = (jnp.arange(b, dtype=jnp.int32) * e)[:, None, None]
        csr_bounds = (
            (g.csr_bounds + e_offsets).transpose(1, 0, 2).reshape(2, -1)
        )
        csr_max_chunks = (g.csr_max_chunks or 1) + (1 if b > 1 else 0)
    return Graph(
        x=flat(g.x),
        pos=flat(g.pos),
        senders=flat_senders,
        receivers=(g.receivers + offsets).reshape(-1),
        edge_attr=flat(g.edge_attr),
        node_mask=flat(g.node_mask),
        edge_mask=flat(g.edge_mask),
        y=flat(g.y),
        exclude_mask=flat(g.exclude_mask),
        twin_perm=twin_perm,
        csr_bounds=csr_bounds,
        ell_degree=g.ell_degree,
        partition_axis=g.partition_axis,
        csr_max_chunks=csr_max_chunks,
    )


def concat_graphs(graphs: list) -> Graph:
    """Batch same-shape padded Graphs into one flat graph by concatenation,
    offsetting edge indices by each graph's node count — the static-shape
    analog of ``jraph.batch`` / PyG concat-batching.

    Every graph must share the same padded (N, E) so the result's shape is a
    pure function of batch size; edges never cross graph boundaries, so one
    flat segment op processes the whole batch. The flat node axis is laid out
    ``[graph0 | graph1 | ...]``, which makes it shardable across devices at
    graph granularity.
    """
    if len(graphs) == 1:
        return graphs[0]
    n = graphs[0].num_nodes
    e = graphs[0].num_edges
    for g in graphs:
        if g.num_nodes != n or g.num_edges != e:
            raise ValueError("concat_graphs requires identical padded shapes")
        if g.partition_axis is not None or g.halo_send_idx is not None:
            raise ValueError(
                "concat_graphs: partitioned graphs (partition_axis / "
                "halo_send_idx set) have shard-local index spaces and cannot "
                "be concat-batched; batch BEFORE partitioning"
            )

    def cat(field):
        vals = [getattr(g, field) for g in graphs]
        if vals[0] is None:
            return None
        return np.concatenate([np.asarray(v) for v in vals], axis=0)

    senders = np.concatenate(
        [np.asarray(g.senders) + i * n for i, g in enumerate(graphs)]
    ).astype(np.int32)
    receivers = np.concatenate(
        [np.asarray(g.receivers) + i * n for i, g in enumerate(graphs)]
    ).astype(np.int32)
    twin_perm = None
    if graphs[0].twin_perm is not None:
        twin_perm = np.concatenate(
            [np.asarray(g.twin_perm) + i * e for i, g in enumerate(graphs)]
        ).astype(np.int32)
    csr_bounds = None
    csr_max_chunks = None
    if graphs[0].csr_bounds is not None:
        # exact shift-merge: graph i's [start, end) ranges move by i*e in the
        # concatenated edge array (N % BN == 0 keeps blocks within one graph,
        # and the per-graph clamped ends keep each member's padding edges out
        # of every range). The shift can realign a range's BE windows by at
        # most one -> +1 chunk headroom for multi-graph batches.
        csr_bounds = np.concatenate(
            [np.asarray(g.csr_bounds) + i * e for i, g in enumerate(graphs)],
            axis=1,
        ).astype(np.int32)
        csr_max_chunks = max(
            (g.csr_max_chunks or 1) for g in graphs
        ) + (1 if len(graphs) > 1 else 0)
    return Graph(
        x=cat("x"),
        pos=cat("pos"),
        senders=senders,
        receivers=receivers,
        edge_attr=cat("edge_attr"),
        node_mask=cat("node_mask"),
        edge_mask=cat("edge_mask"),
        y=cat("y"),
        exclude_mask=cat("exclude_mask"),
        twin_perm=twin_perm,
        csr_bounds=csr_bounds,
        ell_degree=graphs[0].ell_degree,
        csr_max_chunks=csr_max_chunks,
    )
