"""Segment reductions over padded edge lists.

These are the TPU-native replacements for the reference's externally-delegated
sparse primitives: torch-scatter's ``aggr="add"`` message aggregation
(``graphphysics/models/layers.py:649,694``) and DGL's sparse row softmax
(``layers.py:414-419``). Everything operates on static-shape edge lists with a
validity mask; XLA lowers the gathers/scatters to efficient TPU code, and the
Pallas kernels in ``ops.pallas`` provide fused fast paths on the same layout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


def _is_16bit_float(dtype) -> bool:
    return dtype in (jnp.bfloat16, jnp.float16)


def _packed_take_impl(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather of a 16-bit ``[N, h]`` array via a 32-bit packed view:
    bitcast pairs of 16-bit lanes into one uint32 lane, gather rows in
    uint32, bitcast back. Pure layout ops around a 32-bit gather.
    ``idx`` may have any shape; the result is ``idx.shape + (h,)``."""
    n, hh = x.shape
    u16 = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(n, hh // 2, 2)
    packed = jax.lax.bitcast_convert_type(u16, jnp.uint32)  # [N, h//2]
    g = jnp.take(packed, idx, axis=0)  # idx.shape + [h//2] 32-bit gather
    g16 = jax.lax.bitcast_convert_type(g, jnp.uint16)  # idx.shape + [h//2, 2]
    return jax.lax.bitcast_convert_type(
        g16.reshape(idx.shape + (hh,)), x.dtype
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _packed_take(x: jax.Array, idx: jax.Array, num_rows: int) -> jax.Array:
    return _packed_take_impl(x, idx)


def _packed_take_fwd(x, idx, num_rows):
    return _packed_take_impl(x, idx), idx


def _packed_take_bwd(num_rows, idx, g):
    # accumulate the scatter-add in f32 (both faster — no 16-bit scatter
    # lowering — and more accurate than bf16 accumulation); the cotangent's
    # dtype equals the primal input's
    gx = jax.ops.segment_sum(
        g.reshape(-1, g.shape[-1]).astype(jnp.float32),
        idx.reshape(-1),
        num_segments=num_rows,
    ).astype(g.dtype)
    return gx, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_packed_take.defvjp(_packed_take_fwd, _packed_take_bwd)


def take_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take(x, idx, axis=0)`` with a fast path for 16-bit 2-D arrays.

    XLA's TPU lowering of 16-bit gathers/scatters is pathological (measured
    ~25x slower end-to-end than f32 on the tunnel chip, 2026-08-18): each
    16-bit element tiles a full sublane. Packing adjacent feature pairs into
    uint32 lanes makes the gather a plain 32-bit one; the custom VJP
    scatter-adds the cotangent with f32 accumulation.

    Limitation: the custom_vjp makes the 16-bit fast path reverse-mode only
    (jax.jvp/jacfwd raise on it; f32 and odd-width inputs are unaffected) —
    acceptable because training/rollout only ever differentiate in reverse."""
    if x.ndim == 2 and _is_16bit_float(x.dtype) and x.shape[1] % 2 == 0:
        return _packed_take(x, idx, x.shape[0])
    return jnp.take(x, idx, axis=0)


def masked_segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum ``data`` (``[E, ...]``) into ``num_segments`` rows by ``segment_ids``.

    ``mask`` (``[E]`` bool) zeroes padded edges' contributions. 16-bit inputs
    accumulate in f32 (no 16-bit scatter lowering; single rounding at the
    end) and return their own dtype.
    """
    out_dtype = data.dtype
    if _is_16bit_float(out_dtype):
        data = data.astype(jnp.float32)
    if mask is not None:
        data = data * mask.reshape(mask.shape + (1,) * (data.ndim - 1)).astype(
            data.dtype
        )
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    return out.astype(out_dtype)


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-16,
) -> jax.Array:
    """Numerically-stable softmax of per-edge ``scores`` (``[E, ...]``) within
    each segment — the masked-edge analog of DGL's sparse ``softmax()`` over a
    row's *stored* entries. Padded edges get probability 0; empty segments
    produce all-zero rows (harmless: nothing aggregates from them).

    16-bit scores compute internally in f32 (avoids the pathological 16-bit
    segment-scatter lowering on TPU and keeps exp/normalization accurate) and
    return their own dtype.
    """
    out_dtype = scores.dtype
    if _is_16bit_float(out_dtype):
        scores = scores.astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        scores = jnp.where(m, scores, _NEG_INF)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(scores - seg_max[segment_ids])
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - 1))
        ex = jnp.where(m, ex, 0.0)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return (ex / (denom[segment_ids] + eps)).astype(out_dtype)
