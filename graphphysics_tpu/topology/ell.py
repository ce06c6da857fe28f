"""Fixed-degree (ELL) edge layout construction.

The TPU-decisive data-layout choice of this framework: edges are grouped by
receiver ("owner") into a fixed number of slots per node, so that

- edge->node aggregation is a dense ``reshape([N, D, H]).sum(1)`` (full
  HBM bandwidth) instead of a scatter (XLA scatter: ~25 GB/s measured),
- the per-node segment softmax of graph attention is a dense masked softmax
  over the slot axis,
- the backward of ``x[senders]`` becomes a *gather* through the symmetric
  twin permutation + the same dense reduce (mesh adjacency is symmetric:
  every edge (s, r) has a twin (r, s)).

There is no reference analog — the reference delegates these to
torch-scatter/DGL (graphphysics/models/layers.py:649,694,415-450).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class EllLayout(NamedTuple):
    senders: np.ndarray  # [N*D] int32: neighbor per slot; owner for padding slots
    receivers: np.ndarray  # [N*D] int32: owner = slot // D (materialized)
    edge_mask: np.ndarray  # [N*D] bool: real-edge slots
    edge_perm: np.ndarray  # [N*D] int32: original COO edge index per slot (0 for padding)
    twin_perm: np.ndarray  # [N*D] int32: slot of the reversed edge (self for padding)
    degree: int


def max_in_degree(receivers: np.ndarray, num_nodes: int) -> int:
    if len(receivers) == 0:
        return 0
    return int(np.bincount(receivers, minlength=num_nodes).max())


def build_ell(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    degree: Optional[int] = None,
    degree_multiple: int = 4,
) -> EllLayout:
    """Group a symmetric COO edge list by receiver into ``degree`` slots per
    node. Raises if any node's in-degree exceeds ``degree`` or if the list is
    not symmetric (every (s, r) must have an (r, s) twin)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = len(senders)
    counts = np.bincount(receivers, minlength=num_nodes)
    dmax = int(counts.max()) if e else 0
    if degree is None:
        degree = max(
            ((dmax + degree_multiple - 1) // degree_multiple) * degree_multiple,
            degree_multiple,
        )
    if dmax > degree:
        raise ValueError(f"max in-degree {dmax} exceeds ELL degree {degree}")

    from graphphysics_tpu.native import build_ell_native

    native = build_ell_native(senders, receivers, num_nodes, degree)
    if native is not None:
        senders_ell, mask_n, edge_perm_n, twin_n = native
        return EllLayout(
            senders=senders_ell,
            receivers=np.repeat(
                np.arange(num_nodes, dtype=np.int32), degree
            ),
            edge_mask=mask_n,
            edge_perm=edge_perm_n,
            twin_perm=twin_n,
            degree=int(degree),
        )

    owners_all = np.repeat(np.arange(num_nodes, dtype=np.int64), degree)
    n_slots = num_nodes * degree

    order = np.argsort(receivers, kind="stable")
    r_sorted = receivers[order]
    s_sorted = senders[order]
    starts = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_in_node = np.arange(e, dtype=np.int64) - starts[r_sorted]
    slots = r_sorted * degree + slot_in_node

    senders_ell = owners_all.copy()
    senders_ell[slots] = s_sorted
    edge_mask = np.zeros(n_slots, bool)
    edge_mask[slots] = True
    edge_perm = np.zeros(n_slots, np.int64)
    edge_perm[slots] = order

    # twin: slot holding the reversed edge. key(slot) = owner*N + sender for
    # real slots; the twin of slot k is the slot with key sender*N + owner.
    keys = np.full(n_slots, -1, np.int64)
    keys[slots] = r_sorted * num_nodes + s_sorted
    real = np.flatnonzero(edge_mask)
    key_order = np.argsort(keys[real], kind="stable")
    sorted_keys = keys[real][key_order]
    sorted_slots = real[key_order]
    want = senders_ell[real] * num_nodes + owners_all[real]
    pos = np.searchsorted(sorted_keys, want)
    ok = (pos < len(sorted_keys)) & (sorted_keys[np.minimum(pos, len(sorted_keys) - 1)] == want)
    if not ok.all():
        raise ValueError(
            "edge list is not symmetric: "
            f"{int((~ok).sum())} edges have no reverse twin"
        )
    twin_perm = np.arange(n_slots, dtype=np.int64)
    twin_perm[real] = sorted_slots[pos]

    return EllLayout(
        senders=senders_ell.astype(np.int32),
        receivers=owners_all.astype(np.int32),
        edge_mask=edge_mask,
        edge_perm=edge_perm.astype(np.int32),
        twin_perm=twin_perm.astype(np.int32),
        degree=int(degree),
    )
