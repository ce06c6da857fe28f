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

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from graphphysics_tpu.ops.segment import take_rows


_WIRE_DTYPES = {"bf16": jnp.bfloat16, "f16": jnp.float16}

# Diagnostic hook (benchmarks/scaling.py): when set, replaces the halo
# all_to_all with a same-shape substitute. Timing the partitioned step with
# the exchange stubbed to identity isolates the collective's share of the
# step — the remainder of any scaling deficit is imbalance/overhead.
_EXCHANGE_OVERRIDE = None


def _exchange(send: jax.Array, axis_name: str) -> jax.Array:
    if _EXCHANGE_OVERRIDE is not None:
        return _EXCHANGE_OVERRIDE(send, axis_name)
    return jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )


@contextlib.contextmanager
def stub_exchange_for_benchmark():
    """Replace the halo ``all_to_all`` with IDENTITY (same shapes, zero
    comms) for the duration of the context — the collective-share
    diagnostic. Numerical results are WRONG under this stub; use only for
    timing, and only with freshly-traced step functions (already-compiled
    closures keep whatever exchange they traced)."""
    global _EXCHANGE_OVERRIDE
    prev = _EXCHANGE_OVERRIDE
    _EXCHANGE_OVERRIDE = lambda send, axis_name: send
    try:
        yield
    finally:
        _EXCHANGE_OVERRIDE = prev


def halo_recv(
    x: jax.Array,
    halo_send_idx: jax.Array,
    axis_name: str,
    wire_dtype: Optional[str] = None,
) -> jax.Array:
    """The halo rows ``[P*B, F]`` received from each peer (peer-major,
    request-slot-minor) — the collective half of ``halo_table``, exposed
    separately so split-edge layouts (``Graph.num_local_edges``) can keep
    the local partial compute OUTSIDE the all_to_all's data dependencies.

    Args:
        x: ``[Nl, F]`` this device's node rows (inside ``shard_map``).
        halo_send_idx: ``[P, B]`` local indices to send to each peer.
        axis_name: the graph mesh axis.
        wire_dtype: "bf16"/"f16" ships boundary rows over the all_to_all in
            16 bits — HALF the per-layer ICI bytes — and upcasts back to
            ``x.dtype`` for the local math. The cast is linear-adjacent, so
            autodiff ships the backward cotangent 16-bit too (rounded once
            each way; f32 accumulation everywhere else). None = x.dtype.
    """
    p, b = halo_send_idx.shape
    send = take_rows(x, halo_send_idx)  # [P, B, F] (16-bit-safe gather)
    wire = _WIRE_DTYPES.get(wire_dtype) if wire_dtype else None
    if wire is not None and send.dtype != wire:
        # optimization_barriers PIN the casts to their side of the
        # collective: convert commutes with all_to_all, and XLA's algebraic
        # simplifier has been observed hoisting the upcast in front of it —
        # shipping f32 and defeating the knob. Barriers transpose to
        # barriers, so the backward cotangent exchange is pinned 16-bit too.
        send = jax.lax.optimization_barrier(send.astype(wire))
    # device d's row q goes to device q; received row q came from device q
    recv = _exchange(send, axis_name)  # [P, B, F]
    if recv.dtype != x.dtype:
        recv = jax.lax.optimization_barrier(recv).astype(x.dtype)
    return recv.reshape(p * b, x.shape[-1])


def halo_table(
    x: jax.Array,
    halo_send_idx: jax.Array,
    axis_name: str,
    wire_dtype: Optional[str] = None,
) -> jax.Array:
    """Build the exchange table ``[Nl + P*B, F]`` = local rows followed by
    the halo rows received from each peer (see ``halo_recv``)."""
    return jnp.concatenate(
        [x, halo_recv(x, halo_send_idx, axis_name, wire_dtype)], axis=0
    )


def partitioned_gather(
    x: jax.Array,
    senders: jax.Array,
    axis_name: str,
    halo_send_idx: Optional[jax.Array] = None,
    halo_dtype: Optional[str] = None,
) -> jax.Array:
    """Gather sender rows for an edge-partitioned graph.

    Without ``halo_send_idx``: ``senders`` are GLOBAL ids into the
    all-gathered table (O(N) comms; backward lowers to reduce_scatter).
    With it: ``senders`` are LOCAL ids into the halo exchange table
    (O(boundary) comms), shipped in ``halo_dtype`` ("bf16"/"f16"/None —
    see ``halo_table``).
    """
    if halo_send_idx is None:
        table = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    else:
        table = halo_table(x, halo_send_idx, axis_name, halo_dtype)
    return take_rows(table, senders)
