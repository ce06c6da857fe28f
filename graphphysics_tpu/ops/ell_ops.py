"""Dense-layout ops for the fixed-degree ELL edge layout (``topology.ell``).

In ELL, slot ``e`` belongs to owner node ``e // D``; every segment op over
owners becomes a dense reshape over the slot axis, running at full HBM
bandwidth on the VPU — no scatters anywhere in the train step:

- ``ell_segment_sum``: edge->node aggregation as ``reshape.sum`` (replaces
  torch-scatter, reference ``graphphysics/models/layers.py:649,694``)
- ``ell_softmax``: per-node softmax over slots (replaces DGL sparse softmax,
  ``layers.py:414-419``)
- ``ell_gather``: ``x[senders]`` whose backward is a twin-permutation gather
  + dense reduce instead of a scatter-add (mesh adjacency is symmetric).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def ell_segment_sum(
    data: jax.Array,
    ell_degree: int,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum slot rows into their owners: ``[N*D, ...] -> [N, ...]``."""
    if edge_mask is not None:
        data = data * edge_mask.reshape(
            edge_mask.shape + (1,) * (data.ndim - 1)
        ).astype(data.dtype)
    n = data.shape[0] // ell_degree
    return data.reshape((n, ell_degree) + data.shape[1:]).sum(axis=1)


def ell_repeat(x: jax.Array, ell_degree: int) -> jax.Array:
    """Owner values broadcast to slots: ``[N, ...] -> [N*D, ...]`` — the ELL
    form of ``x[receivers]`` (backward is a dense reduce, not a scatter)."""
    shape = (x.shape[0] * ell_degree,) + x.shape[1:]
    return jnp.broadcast_to(
        x[:, None], (x.shape[0], ell_degree) + x.shape[1:]
    ).reshape(shape)


def ell_softmax(
    scores: jax.Array,
    ell_degree: int,
    edge_mask: Optional[jax.Array] = None,
    eps: float = 1e-16,
) -> jax.Array:
    """Per-owner softmax over the slot axis; masked slots get probability 0.
    Matches ``ops.segment.segment_softmax`` semantics on the ELL layout."""
    n = scores.shape[0] // ell_degree
    s = scores.reshape((n, ell_degree) + scores.shape[1:])
    if edge_mask is not None:
        m = edge_mask.reshape(
            (n, ell_degree) + (1,) * (scores.ndim - 1)
        )
        s = jnp.where(m, s, _NEG_INF)
    s_max = jnp.max(s, axis=1, keepdims=True)
    s_max = jnp.where(jnp.isfinite(s_max), s_max, 0.0)
    ex = jnp.exp(s - s_max)
    if edge_mask is not None:
        ex = jnp.where(m, ex, 0.0)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    return (ex / (denom + eps)).reshape(scores.shape)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def ell_gather(
    x: jax.Array,
    senders: jax.Array,
    twin_perm: jax.Array,
    ell_degree: int,
) -> jax.Array:
    """``x[senders]`` with a scatter-free backward.

    vjp: ``grad_x[n] = sum_{e: senders[e]==n} g[e]``. Because
    ``senders[e] == owner(twin_perm[e])`` for every slot (twin of padding is
    itself), this equals ``ell_segment_sum(g[twin_perm])`` — a sorted gather
    plus a dense reduce.
    """
    return jnp.take(x, senders, axis=0)


def _ell_gather_fwd(x, senders, twin_perm, ell_degree):
    return jnp.take(x, senders, axis=0), twin_perm


def _ell_gather_bwd(ell_degree, twin_perm, g):
    twinned = jnp.take(g, twin_perm, axis=0)
    return ell_segment_sum(twinned, ell_degree), None, None


ell_gather.defvjp(_ell_gather_fwd, _ell_gather_bwd)
