"""Pallas TPU kernel: fused sparse-attention segment-softmax + SpMM.

First-party replacement for the scatter-bound half of the reference's DGL
sparse attention trio — sparse row softmax (``graphphysics/models/layers.py
:414-419``) and SpMM (``dglsp.bspmm``, ``:449-452``). The SDDMM half (per-edge
scores) deliberately stays in XLA: it is two gathers feeding an elementwise
reduce, which XLA fuses into the q/k/v projection matmuls; re-expressing the
gathers in-kernel would burn the same MXU cycles as the one-hot trick below
without removing any HBM traffic.

Layout: the same segment-sorted CSR edge list as ``ops.pallas_segment`` —
the host sorts edges by the softmax segment key once per topology and
provides per-node-block edge ranges (``compute_block_bounds``). Per-edge
data is packed into ONE ``[E_pad, C]`` array (``[values | scores | segment]``,
C rounded up to the 128-lane tile) so each chunk is a single tiling-aligned
DMA; Mosaic's HBM slicing rejects narrow (H-wide) column slices.

Algorithm: flash-attention-style ONLINE softmax over the chunks — running
per-row max ``m`` and normalizer ``l`` (kept head-major ``[H, BN]``), with
every reduction expressed as a ``dot_general`` against the chunk's one-hot
ownership matrix on the MXU; the ``[E, H]`` attention-weight matrix is never
materialized in HBM, and each output row belongs to exactly one program so
there are no write conflicts. Only Mosaic-friendly ops are used: static
value slices, broadcasts, sublane concats, iota, and matmuls — no reshapes
or transposes.

The public entry ``csr_softmax_spmm`` carries a custom VJP whose backward is
SEGMENT-REDUCTION-FREE: the forward kernel saves its online-softmax stats
``(m, l)`` per node, and the softmax-VJP inner term is the flash-attention
"delta" identity ``sum_seg(attn * dattn) = <out, g>`` per head — a node-level
rowsum, not an edge-level segment sum. The whole backward is one packed
sorted gather plus elementwise math (no ``segment_max``/``segment_sum``
recompute), so the kernel is cheap inside the train step in both directions.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from graphphysics_tpu.ops.pallas_segment import (
    compute_block_offsets,  # noqa: F401  (the contiguous-offsets variant)
)

# Defaults tuned for H=4..8 heads, D=H*Dh=64..512, f32. The per-chunk
# one-hot reductions cost O(BE * BN) per chunk — linear in BLOCK_NODES
# across the whole grid — so smaller node blocks trade launch/DMA overhead
# for less MXU work: the 2026-08-21 same-window sweep at aneurysm scale
# (benchmarks/kernel_block_sweep.py) measured bn128/be512 at 0.638x of the
# XLA path vs 0.658x for the former bn256 default (bn512: 0.714x).
BLOCK_NODES = 128  # segment rows per program
BLOCK_EDGES = 512  # edges DMA'd + reduced per chunk

_NEG = -1e30  # finite -inf stand-in (inf - inf would NaN in the online max)


def compute_block_bounds(
    segments_sorted: np.ndarray,
    num_nodes: int,
    num_real_edges: Optional[int] = None,
    block_nodes: int = BLOCK_NODES,
) -> np.ndarray:
    """Host-side: per-node-block [start, end) edge ranges as a ``[2, NB]``
    int32 array (row 0 starts, row 1 ends). Unlike contiguous offsets, ends
    may CLAMP to ``num_real_edges`` so trailing padding edges (sorted last —
    they carry the largest sender) are never streamed, and ranges of
    concatenated graphs may leave gaps over each graph's padding."""
    segments_sorted = np.asarray(segments_sorted)
    num_blocks = -(-num_nodes // block_nodes)
    bounds = np.arange(num_blocks + 1) * block_nodes
    offsets = np.searchsorted(segments_sorted, bounds[1:], side="left")
    starts = np.concatenate([[0], offsets[:-1]])
    ends = offsets
    if num_real_edges is not None:
        starts = np.minimum(starts, num_real_edges)
        ends = np.minimum(ends, num_real_edges)
    return np.stack([starts, ends]).astype(np.int32)


def compute_max_chunks_bounds(
    bounds: np.ndarray, block_edges: int = BLOCK_EDGES
) -> int:
    """Host-side: BE-aligned windows needed by the busiest block's range."""
    starts, ends = np.asarray(bounds, np.int64)
    first = starts // block_edges
    last = -(-np.maximum(ends, starts + 1) // block_edges)
    return int(np.maximum(last - first, 1).max())


def _dot(a, b, dims):
    """f32 dot_general at HIGHEST precision — the one-hot/expansion reductions
    must be exact (default MXU precision truncates to bf16, breaking parity
    with the XLA path)."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(
    bounds_ref,  # scalar prefetch: [2, num_blocks] int32 (block starts; ends)
    packed_ref,  # HBM: [E_pad, C] = [values(D) | scores(H) | seg bits | pad]
    out_ref,  # VMEM: [BN, D] f32
    ml_ref,  # VMEM: [2*H, BN] f32 — final (m; l) softmax stats, saved for bwd
    packed_scratch,  # VMEM: [2, BE, C] (stream dtype)
    m_ref,  # VMEM: [H, BN] running max (head-major)
    l_ref,  # VMEM: [H, BN] running sum of exp
    sems,  # DMA semaphores (2,)
    *,
    block_nodes: int,
    block_edges: int,
    max_chunks: int,
    num_heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    row0 = b * block_nodes
    e_start = bounds_ref[0, b]
    e_end = bounds_ref[1, b]
    # BE-aligned absolute windows covering [e_start, e_end) — DMA offsets stay
    # tiling-aligned; edges of neighboring blocks inside a straddling window
    # are dropped by the one-hot row compare (their segment falls outside
    # [row0, row0 + BN)), as are masked/padded edges (segment == num_nodes).
    c0 = e_start // block_edges
    d = num_heads * head_dim

    out_ref[:] = jnp.zeros_like(out_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)

    # [H, D] 0/1 head-expansion matrix: column c belongs to head c // Dh.
    # Per-head quantities expand to head-blocked D columns as exact matmuls.
    head_of_col = (
        jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 1) // head_dim
    )
    head_row = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 0)
    expand = (head_row == head_of_col).astype(jnp.float32)  # [H, D]

    def start_chunk(i, slot):
        c = c0 + i

        @pl.when(c * block_edges < e_end)
        def _():
            off = pl.multiple_of(c * block_edges, block_edges)
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(off, block_edges), :],
                packed_scratch.at[slot],
                sems.at[slot],
            ).start()

    start_chunk(0, 0)

    def body(i, _):
        c = c0 + i
        slot = jax.lax.rem(i, 2)

        @pl.when(c * block_edges < e_end)
        def _():
            # overlap: kick off the next chunk's DMA before reducing this one
            start_chunk(i + 1, 1 - slot)
            off = pl.multiple_of(c * block_edges, block_edges)
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(off, block_edges), :],
                packed_scratch.at[slot],
                sems.at[slot],
            ).wait()

            raw = packed_scratch[slot]  # [BE, C] stream dtype
            # upcast once: the stream may be bf16 (halved HBM traffic);
            # all arithmetic stays f32
            block = raw.astype(jnp.float32)
            values_c = block[:, :d]  # [BE, D]
            scores_c = block[:, d : d + num_heads]  # [BE, H]
            # segment ids travel as FLOAT VALUES in trailing lanes (bit
            # patterns through bf16 are unsafe: int patterns that form NaNs
            # get canonicalized in transit): one f32 lane exact below 2^24,
            # or three base-256 bf16 digit lanes (each 0..255 exact) — the
            # same 2^24 ceiling
            sbase = d + num_heads
            if raw.dtype == jnp.float32:
                seg_col = block[:, sbase : sbase + 1].astype(jnp.int32)
            else:
                d0 = block[:, sbase : sbase + 1].astype(jnp.int32)
                d1 = block[:, sbase + 1 : sbase + 2].astype(jnp.int32)
                d2 = block[:, sbase + 2 : sbase + 3].astype(jnp.int32)
                seg_col = d0 + (d1 << 8) + (d2 << 16)  # [BE, 1]

            cols = jax.lax.broadcasted_iota(
                jnp.int32, (block_edges, block_nodes), 1
            ) + row0
            owned = cols == seg_col  # [BE, BN] bool
            onehot_t = owned.astype(jnp.float32)  # [BE, BN]

            # chunk max per row, head-major (H is small and static)
            m_rows = []
            for hh in range(num_heads):
                sc = scores_c[:, hh : hh + 1]  # [BE, 1]
                m_rows.append(
                    jnp.max(
                        jnp.where(owned, sc, _NEG), axis=0, keepdims=True
                    )  # [1, BN]
                )
            m_c = jnp.concatenate(m_rows, axis=0)  # [H, BN]
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, m_c)
            alpha = jnp.exp(m_old - m_new)  # [H, BN], <= 1

            # per-edge running max: gather by one-hot matmul (contract BN)
            m_e = _dot(onehot_t, m_new, (((1,), (1,))))  # [BE, H]
            in_block = jnp.logical_and(
                seg_col >= row0, seg_col < row0 + block_nodes
            )  # [BE, 1]
            # exponent <= 0 for in-block edges (m_e >= own score); out-of-block
            # edges are zeroed BEFORE the matmuls (0 * inf would NaN on the MXU)
            p = jnp.where(in_block, jnp.exp(scores_c - m_e), 0.0)  # [BE, H]

            l_ref[:] = l_ref[:] * alpha + _dot(
                p, onehot_t, (((0,), (0,)))
            )  # [H, BN]
            p_exp = _dot(p, expand, (((1,), (0,))))  # [BE, D]
            alpha_exp = _dot(alpha, expand, (((0,), (0,))))  # [BN, D]
            out_ref[:] = out_ref[:] * alpha_exp + _dot(
                onehot_t, values_c * p_exp, (((0,), (0,)))
            )
            m_ref[:] = m_new

        return 0

    jax.lax.fori_loop(0, max_chunks, body, 0)

    # same epsilon as ops.segment.segment_softmax: empty rows -> exact 0
    l_exp = _dot(l_ref[:], expand, (((0,), (0,))))  # [BN, D]
    out_ref[:] = out_ref[:] / (l_exp + 1e-16)
    # save the final softmax stats for the backward pass (sublane concat)
    ml_ref[:] = jnp.concatenate([m_ref[:], l_ref[:]], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_nodes", "num_heads", "block_nodes", "block_edges", "max_chunks",
        "stream_dtype",
    ),
)
def _softmax_spmm_impl(
    scores: jax.Array,
    values: jax.Array,
    segments: jax.Array,
    bounds: jax.Array,
    num_nodes: int,
    num_heads: int,
    block_nodes: int,
    block_edges: int,
    max_chunks: int,
    stream_dtype: str = "f32",
) -> jax.Array:
    e, h = scores.shape
    d = values.shape[1]
    assert d % h == 0
    head_dim = d // h
    num_blocks = -(-num_nodes // block_nodes)
    e_pad = (-(-(e + 1) // block_edges)) * block_edges
    seg32 = segments.astype(jnp.int32)

    if stream_dtype == "f32":
        dt, seg_lanes = jnp.float32, 1
    elif stream_dtype == "bf16":
        dt, seg_lanes = jnp.bfloat16, 3
    else:
        raise ValueError(f"unknown stream_dtype {stream_dtype!r}")
    if num_nodes >= 1 << 24:
        raise ValueError("CSR kernel segment encoding caps num_nodes at 2^24")
    c_width = -(-(d + h + seg_lanes) // 128) * 128  # lane-tile aligned

    # pack [values | scores | seg bits] into one aligned-DMA array; padding
    # rows carry score -inf and segment num_nodes (dropped by the kernel)
    packed = jnp.zeros((e_pad, c_width), dt)
    packed = packed.at[:e, :d].set(values.astype(dt))
    packed = packed.at[:e, d : d + h].set(scores.astype(dt))
    packed = packed.at[e:, d : d + h].set(jnp.asarray(_NEG, dt))
    seg_p = jnp.full((e_pad,), num_nodes, jnp.int32).at[:e].set(seg32)
    if stream_dtype == "f32":
        packed = packed.at[:, d + h].set(seg_p.astype(jnp.float32))
    else:
        packed = packed.at[:, d + h].set(
            (seg_p & 0xFF).astype(jnp.bfloat16)
        )
        packed = packed.at[:, d + h + 1].set(
            ((seg_p >> 8) & 0xFF).astype(jnp.bfloat16)
        )
        packed = packed.at[:, d + h + 2].set(
            ((seg_p >> 16) & 0xFF).astype(jnp.bfloat16)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (block_nodes, d), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2 * num_heads, block_nodes),
                lambda b, *_: (0, b),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_edges, c_width), dt),
            pltpu.VMEM((num_heads, block_nodes), jnp.float32),
            pltpu.VMEM((num_heads, block_nodes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel,
        block_nodes=block_nodes,
        block_edges=block_edges,
        max_chunks=max_chunks,
        num_heads=num_heads,
        head_dim=head_dim,
    )
    out, ml = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * block_nodes, d), jnp.float32),
            jax.ShapeDtypeStruct(
                (2 * num_heads, num_blocks * block_nodes), jnp.float32
            ),
        ),
    )(bounds, packed)
    return out[:num_nodes].astype(values.dtype), ml[:, :num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def csr_softmax_spmm(
    scores: jax.Array,
    values: jax.Array,
    segments: jax.Array,
    bounds: jax.Array,
    num_nodes: int,
    block_nodes: int = BLOCK_NODES,
    block_edges: int = BLOCK_EDGES,
    max_chunks: Optional[int] = None,
    stream_dtype: str = "f32",
) -> jax.Array:
    """Fused segment-softmax + weighted segment-sum (one Pallas kernel).

    Args:
        scores: ``[E, H]`` per-edge per-head attention scores. Masked edges
            must carry ``-1e30`` (and segment ``num_nodes``; see wrapper).
        values: ``[E, D]`` per-edge values, D = H * head_dim head-blocked.
        segments: ``[E]`` int32 softmax segment per edge, ASCENDING
            (host-sorted once per topology); masked/padded edges may carry
            ``num_nodes`` in place.
        bounds: ``compute_block_bounds(segments, num_nodes, ...)`` —
            ``[2, num_blocks]`` per-block [start, end) edge ranges; ends may
            clamp before trailing padding and ranges may leave gaps.

    Returns:
        ``[num_nodes, D]``: ``sum_e softmax(scores)[e] * values[e]`` per
        segment — ``segment_softmax`` + ``masked_segment_sum`` of
        ``ops.segment`` in one pass, no ``[E, H]`` weights in HBM.
    """
    h = scores.shape[1]
    if max_chunks is None:
        max_chunks = -(-scores.shape[0] // block_edges) + 1
    out, _ = _softmax_spmm_impl(
        scores, values, segments, bounds,
        num_nodes, h, block_nodes, block_edges, max_chunks,
        stream_dtype=stream_dtype,
    )
    return out


def _fwd(scores, values, segments, bounds, num_nodes, bn, be, mc, sd):
    if mc is None:
        mc = -(-scores.shape[0] // be) + 1
    out, ml = _softmax_spmm_impl(
        scores, values, segments, bounds,
        num_nodes, scores.shape[1], bn, be, mc, stream_dtype=sd,
    )
    return out, (scores, values, segments, ml, out)


def _bwd(num_nodes, bn, be, mc, sd, res, g):
    """Segment-reduction-free backward.

    The fwd kernel saves its online-softmax stats ``(m, l)`` per node, and the
    softmax-VJP inner term needs no edge-level reduction either (the flash
    -attention "delta" identity): ``sum_seg(attn * dattn) = <out, g>`` per
    head at NODE granularity, because ``out = sum_seg attn * v``. The whole
    backward is then one packed sorted gather + elementwise math — no
    ``segment_max``/``segment_sum`` recompute like a naive VJP would need.
    """
    scores, values, segments, ml, out = res
    h = scores.shape[1]
    pack = _pack_node_side(ml, out, g, num_nodes, h, values.shape[1])
    dscores, dvalues = _edge_grads(scores, values, segments, pack, num_nodes)
    return dscores, dvalues, None, None


csr_softmax_spmm.defvjp(_fwd, _bwd)


def _pack_node_side(ml, out, g, num_nodes, h, d):
    """Pack ``[m | l | delta | g]`` per node (+ an all-zero pad row serving
    masked edges, segment == num_nodes) — the one gather the backward needs.
    ``delta`` is the flash-attention identity ``sum_seg(attn * dattn) =
    <out, g>`` per head at NODE granularity, because ``out = sum_seg
    attn * v``."""
    dh = d // h
    g32 = g.astype(jnp.float32)
    delta = (out.astype(jnp.float32) * g32).reshape(num_nodes, h, dh).sum(-1)
    pack = jnp.concatenate([ml[:h].T, ml[h:].T, delta, g32], axis=1)
    return jnp.concatenate(
        [pack, jnp.zeros((1, 3 * h + d), jnp.float32)], axis=0
    )


def _edge_grads(scores, values, segments, pack, num_nodes):
    """Per-edge (dscores, dvalues) from the packed node-side rows: one
    sorted gather + elementwise math. Masked edges (segment == num_nodes)
    hit the all-zero pad row: attn = exp(-1e30 - 0) / (0 + eps) = 0 ->
    zero grads, as in the fwd."""
    e, h = scores.shape
    d = values.shape[1]
    dh = d // h
    rows = jnp.take(pack, jnp.minimum(segments, num_nodes), axis=0)  # [E, 3H+D]
    m_e = rows[:, :h]
    l_e = rows[:, h : 2 * h]
    delta_e = rows[:, 2 * h : 3 * h]
    g_e = rows[:, 3 * h :]
    # same epsilon as the kernel's final normalization
    attn = jnp.exp(scores.astype(jnp.float32) - m_e) / (l_e + 1e-16)  # [E, H]
    attn_exp = jnp.repeat(attn, dh, axis=1)  # [E, D] head-blocked
    dvalues = (attn_exp * g_e).astype(values.dtype)
    dattn = (values.astype(jnp.float32) * g_e).reshape(e, h, dh).sum(-1)
    dscores = (attn * (dattn - delta_e)).astype(scores.dtype)
    return dscores, dvalues


def _repeat_heads(a, dh):
    """[H, N] head-major node stats -> [N, H*dh] head-blocked columns."""
    return jnp.repeat(a.T, dh, axis=1)


def _pair_impl(
    scores_a, values_a, seg_a, bounds_a,
    scores_b, values_b, seg_b, bounds_b,
    num_nodes, bn, be, mc, sd,
):
    h = scores_a.shape[1]
    d = values_a.shape[1]
    dh = d // h
    out_a, ml_a = _softmax_spmm_impl(
        scores_a, values_a, seg_a, bounds_a, num_nodes, h, bn, be, mc,
        stream_dtype=sd,
    )
    out_b, ml_b = _softmax_spmm_impl(
        scores_b, values_b, seg_b, bounds_b, num_nodes, h, bn, be, mc,
        stream_dtype=sd,
    )
    m_a, l_a = ml_a[:h], ml_a[h:]  # [H, N] f32
    m_b, l_b = ml_b[:h], ml_b[h:]
    # online-softmax combine of the two partials; the kernel's empty-row
    # stats (m = -1e30, l = 0) drop out: exp(-1e30 - finite) == 0, and a
    # row empty on BOTH sides gives 0 / eps == 0 like the single kernel.
    m = jnp.maximum(m_a, m_b)
    wa = jnp.exp(m_a - m)
    wb = jnp.exp(m_b - m)
    l = wa * l_a + wb * l_b
    # out_i = acc_i / (l_i + eps)  =>  acc_i = out_i * (l_i + eps), exact
    acc = _repeat_heads(wa * (l_a + 1e-16), dh) * out_a.astype(jnp.float32)
    acc = acc + _repeat_heads(wb * (l_b + 1e-16), dh) * out_b.astype(
        jnp.float32
    )
    out = (acc / (_repeat_heads(l, dh) + 1e-16)).astype(values_a.dtype)
    return out, jnp.concatenate([m, l], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def csr_softmax_spmm_pair(
    scores_a: jax.Array,
    values_a: jax.Array,
    seg_a: jax.Array,
    bounds_a: jax.Array,
    scores_b: jax.Array,
    values_b: jax.Array,
    seg_b: jax.Array,
    bounds_b: jax.Array,
    num_nodes: int,
    block_nodes: int = BLOCK_NODES,
    block_edges: int = BLOCK_EDGES,
    max_chunks: Optional[int] = None,
    stream_dtype: str = "f32",
) -> jax.Array:
    """Fused softmax+SpMM over the UNION of two edge sets sharing the same
    segment space, as two kernel launches + an online-softmax (m, l) merge.

    Exactly equals ``csr_softmax_spmm`` on the concatenated edge list (up to
    fp reassociation) — but the two sets' compute stays INDEPENDENT until
    the node-level merge, which is what the split-edge partitioned layout
    (``Graph.num_local_edges``) exploits: set *a* holds the local edges (no
    collective in their inputs), set *b* the halo edges (downstream of the
    all_to_all), so XLA's latency-hiding scheduler can run the entire local
    kernel under the collective. The custom VJP is the exact combined-
    softmax backward — per-edge math against the MERGED (m, l) stats, the
    same segment-reduction-free form as ``csr_softmax_spmm``'s.
    """
    if max_chunks is None:
        max_chunks = (
            max(scores_a.shape[0], scores_b.shape[0]) // block_edges + 2
        )
    out, _ = _pair_impl(
        scores_a, values_a, seg_a, bounds_a,
        scores_b, values_b, seg_b, bounds_b,
        num_nodes, block_nodes, block_edges, max_chunks, stream_dtype,
    )
    return out


def _pair_fwd(sa, va, ga, ba, sb, vb, gb, bb, num_nodes, bn, be, mc, sd):
    if mc is None:
        mc = max(sa.shape[0], sb.shape[0]) // be + 2
    out, ml = _pair_impl(
        sa, va, ga, ba, sb, vb, gb, bb, num_nodes, bn, be, mc, sd
    )
    return out, (sa, va, ga, sb, vb, gb, ml, out)


def _pair_bwd(num_nodes, bn, be, mc, sd, res, g):
    sa, va, ga, sb, vb, gb, ml, out = res
    h = sa.shape[1]
    pack = _pack_node_side(ml, out, g, num_nodes, h, va.shape[1])
    dsa, dva = _edge_grads(sa, va, ga, pack, num_nodes)
    dsb, dvb = _edge_grads(sb, vb, gb, pack, num_nodes)
    return dsa, dva, None, None, dsb, dvb, None, None


csr_softmax_spmm_pair.defvjp(_pair_fwd, _pair_bwd)


def csr_sparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segments: jax.Array,
    gather_idx: jax.Array,
    bounds: jax.Array,
    edge_mask: Optional[jax.Array] = None,
    scale: float = 1.0,
    block_nodes: int = BLOCK_NODES,
    block_edges: int = BLOCK_EDGES,
    max_chunks: Optional[int] = None,
    stream_dtype: str = "f32",
) -> jax.Array:
    """Sparse graph attention with the fused Pallas softmax+SpMM kernel.

    ``stream_dtype="bf16"`` (EXPERIMENTAL) halves the kernel's HBM traffic by
    streaming values+scores in bfloat16 (segment ids travel as exact base-256
    value digits either way; accumulation stays f32). The result equals the
    XLA path fed bf16-rounded inputs to 1e-6; the deviation from f32 is the
    input rounding itself, amplified through exp() on sharp softmax rows.
    Measured NO speedup on the current chip (the kernel is compute-bound
    there, not DMA-bound) — kept as the fast path for bandwidth-starved
    parts.

    Drop-in for ``ops.attention.sparse_graph_attention`` on a CSR-sorted edge
    list: ``segments`` (ascending) is the query/softmax side and
    ``gather_idx`` the key/value side. With edges sorted by sender this is
    exactly the reference COO convention (queries at ``senders``, k/v at
    ``receivers``, ``layers.py:414-452``); with edges sorted by receiver it
    is the transpose — equal on the symmetric mesh adjacency (the same
    convention note as the ELL path, ``ops.attention``).

    SDDMM (scores) and the q/k/v gathers run in XLA where they fuse with the
    projections; softmax+SpMM run in the kernel.
    """
    n, h, dh = q.shape
    d = h * dh
    q2 = q.reshape(n, d)
    kv2 = jnp.concatenate([k.reshape(n, d), v.reshape(n, d)], axis=1)
    q_e = jnp.take(q2, segments, axis=0)
    kv_e = jnp.take(kv2, gather_idx, axis=0)
    k_e, v_e = kv_e[:, :d], kv_e[:, d:]
    e = q_e.shape[0]
    prod = q_e.astype(jnp.float32) * k_e.astype(jnp.float32)
    scores = prod.reshape(e, h, dh).sum(axis=-1) * jnp.asarray(
        scale, jnp.float32
    )
    seg = segments.astype(jnp.int32)
    if edge_mask is not None:
        scores = jnp.where(edge_mask[:, None], scores, _NEG)
        seg = jnp.where(edge_mask, seg, n)
    out = csr_softmax_spmm(
        scores, v_e, seg, bounds, n, block_nodes, block_edges, max_chunks,
        stream_dtype,
    )
    return out.reshape(n, h, dh).astype(q.dtype)
