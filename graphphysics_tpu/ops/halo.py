"""Halo (boundary) exchange for edge-partitioned graphs.

The communication core of the SURVEY.md §2.4 north star: partition the edge
list across chips and aggregate boundary-node contributions exactly, moving
only boundary rows per layer over ICI — a uniform-budget ``all_to_all`` of
``(P-1) * B`` rows per device, ``B`` = max pairwise boundary — instead of
all-gathering the full node table (the reference has no distributed analog;
this is new design).

Layout (built host-side by ``parallel.partition_graph_halo_np``):

- each device owns ``Nl`` contiguous node rows;
- ``halo_send_idx[q]`` (``[P, B]`` int32, sharded per device) lists the LOCAL
  rows this device must send to peer ``q``, padded with 0;
- edge ``senders`` are pre-remapped LOCAL indices into the exchange table
  ``concat([local_x, halo_rows])`` where the halo row received from peer
  ``q`` at request slot ``r`` sits at ``Nl + q*B + r``.

The runtime op is one gather + one ``all_to_all`` + one gather. Both are
linear, so autodiff yields the exact transpose: scatter-add into the halo
table, ``all_to_all`` back, scatter-add into the owner's rows. XLA's
latency-hiding scheduler can overlap the ``all_to_all`` with independent
local work in the surrounding layer (e.g. the receiver-side gather and the
edge-feature part of the edge MLP input).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graphphysics_tpu.ops.segment import take_rows


def halo_table(
    x: jax.Array, halo_send_idx: jax.Array, axis_name: str
) -> jax.Array:
    """Build the exchange table ``[Nl + P*B, F]`` = local rows followed by
    the halo rows received from each peer (peer-major, request-slot-minor).

    Args:
        x: ``[Nl, F]`` this device's node rows (inside ``shard_map``).
        halo_send_idx: ``[P, B]`` local indices to send to each peer.
        axis_name: the graph mesh axis.
    """
    p, b = halo_send_idx.shape
    send = take_rows(x, halo_send_idx)  # [P, B, F] (16-bit-safe gather)
    # device d's row q goes to device q; received row q came from device q
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )  # [P, B, F]
    return jnp.concatenate([x, recv.reshape(p * b, x.shape[-1])], axis=0)


def partitioned_gather(
    x: jax.Array,
    senders: jax.Array,
    axis_name: str,
    halo_send_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Gather sender rows for an edge-partitioned graph.

    Without ``halo_send_idx``: ``senders`` are GLOBAL ids into the
    all-gathered table (O(N) comms; backward lowers to reduce_scatter).
    With it: ``senders`` are LOCAL ids into the halo exchange table
    (O(boundary) comms).
    """
    if halo_send_idx is None:
        table = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    else:
        table = halo_table(x, halo_send_idx, axis_name)
    return take_rows(table, senders)
