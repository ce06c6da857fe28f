"""Unit tests for segment ops and sparse attention vs dense references."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.ops import (
    masked_segment_sum,
    segment_softmax,
    sparse_graph_attention,
)


def test_masked_segment_sum_matches_numpy(rng):
    e, n, f = 64, 10, 5
    data = rng.normal(size=(e, f)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    mask = rng.random(e) > 0.3

    out = masked_segment_sum(jnp.array(data), jnp.array(seg), n, jnp.array(mask))

    expected = np.zeros((n, f), np.float32)
    for i in range(e):
        if mask[i]:
            expected[seg[i]] += data[i]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one(rng):
    e, n = 50, 8
    scores = rng.normal(size=(e,)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    mask = rng.random(e) > 0.2

    probs = np.asarray(
        segment_softmax(jnp.array(scores), jnp.array(seg), n, jnp.array(mask))
    )
    assert np.all(probs[~mask] == 0.0)
    for s in range(n):
        sel = (seg == s) & mask
        if sel.any():
            np.testing.assert_allclose(probs[sel].sum(), 1.0, rtol=1e-4)


def test_segment_softmax_matches_dense_softmax(rng):
    e, n = 40, 6
    scores = rng.normal(size=(e,)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    probs = np.asarray(segment_softmax(jnp.array(scores), jnp.array(seg), n))
    for s in range(n):
        sel = seg == s
        if sel.any():
            expected = np.exp(scores[sel] - scores[sel].max())
            expected /= expected.sum()
            np.testing.assert_allclose(probs[sel], expected, rtol=1e-4, atol=1e-6)


def test_sparse_attention_matches_dense_masked_attention(rng):
    """The edge-list attention must equal dense attention with a -inf mask on
    non-adjacent pairs (the DGL bsddmm/softmax/bspmm semantics,
    reference graphphysics/models/layers.py:395-457)."""
    n, h, dh = 12, 2, 4
    q = rng.normal(size=(n, h, dh)).astype(np.float32)
    k = rng.normal(size=(n, h, dh)).astype(np.float32)
    v = rng.normal(size=(n, h, dh)).astype(np.float32)
    # build a random adjacency with all self loops so no empty rows
    adj = rng.random((n, n)) > 0.6
    np.fill_diagonal(adj, True)
    senders, receivers = np.nonzero(adj)
    scale = 0.37

    out = sparse_graph_attention(
        jnp.array(q),
        jnp.array(k),
        jnp.array(v),
        jnp.array(senders.astype(np.int32)),
        jnp.array(receivers.astype(np.int32)),
        num_nodes=n,
        scale=scale,
    )

    # dense reference: for node i, softmax over j in adj[i] of <q_i, k_j> * scale
    expected = np.zeros((n, h, dh), np.float32)
    for head in range(h):
        scores = (q[:, head] @ k[:, head].T) * scale
        scores[~adj] = -np.inf
        w = np.exp(scores - scores.max(axis=1, keepdims=True))
        w[~adj] = 0
        w = w / w.sum(axis=1, keepdims=True)
        expected[:, head] = w @ v[:, head]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_sparse_attention_padding_edges_ignored(rng):
    n, h, dh = 8, 1, 4
    q = rng.normal(size=(n, h, dh)).astype(np.float32)
    k = rng.normal(size=(n, h, dh)).astype(np.float32)
    v = rng.normal(size=(n, h, dh)).astype(np.float32)
    senders = np.array([0, 0, 1, 2], np.int32)
    receivers = np.array([1, 2, 0, 0], np.int32)

    base = sparse_graph_attention(
        jnp.array(q), jnp.array(k), jnp.array(v),
        jnp.array(senders), jnp.array(receivers), num_nodes=n,
    )
    # add masked padding edges pointing at node 7
    senders_p = np.concatenate([senders, np.array([7, 7], np.int32)])
    receivers_p = np.concatenate([receivers, np.array([7, 7], np.int32)])
    mask = np.array([True] * 4 + [False] * 2)
    padded = sparse_graph_attention(
        jnp.array(q), jnp.array(k), jnp.array(v),
        jnp.array(senders_p), jnp.array(receivers_p), num_nodes=n,
        edge_mask=jnp.array(mask),
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-5)


def test_ops_jit_and_grad(rng):
    n, e, f = 16, 30, 8
    data = jnp.array(rng.normal(size=(e, f)).astype(np.float32))
    seg = jnp.array(rng.integers(0, n, size=e).astype(np.int32))

    def loss(d):
        return masked_segment_sum(d, seg, n).sum()

    g = jax.jit(jax.grad(loss))(data)
    assert g.shape == data.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_take_rows_bf16_packed_matches_plain_gather(rng):
    from graphphysics_tpu.ops.segment import take_rows

    n, e, h = 37, 120, 16  # even h -> packed path
    x = jnp.array(rng.normal(size=(n, h)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.array(rng.integers(0, n, size=e).astype(np.int32))

    out = take_rows(x, idx)
    ref = jnp.take(x, idx, axis=0)
    assert out.dtype == jnp.bfloat16
    # bitcast packing is exact — identical bits
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint16), np.asarray(ref).view(np.uint16)
    )

    # odd feature width falls back to plain gather
    x_odd = x[:, :15]
    np.testing.assert_array_equal(
        np.asarray(take_rows(x_odd, idx)).view(np.uint16),
        np.asarray(jnp.take(x_odd, idx, axis=0)).view(np.uint16),
    )


def test_take_rows_bf16_grad_matches_f32_scatter(rng):
    from graphphysics_tpu.ops.segment import take_rows

    n, e, h = 11, 40, 8
    x32 = rng.normal(size=(n, h)).astype(np.float32)
    idx = jnp.array(rng.integers(0, n, size=e).astype(np.int32))
    w = rng.normal(size=(e, h)).astype(np.float32)

    def loss_packed(x):
        return (take_rows(x.astype(jnp.bfloat16), idx).astype(jnp.float32) * w).sum()

    def loss_ref(x):
        return (jnp.take(x.astype(jnp.bfloat16), idx, axis=0).astype(jnp.float32) * w).sum()

    g_packed = jax.jit(jax.grad(loss_packed))(jnp.array(x32))
    g_ref = jax.jit(jax.grad(loss_ref))(jnp.array(x32))
    # custom VJP accumulates in f32, reference path accumulates in bf16 —
    # allow bf16-level tolerance
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_ref), rtol=2e-2, atol=2e-2
    )
    assert bool(jnp.all(jnp.isfinite(g_packed)))


def test_masked_segment_sum_bf16_accumulates_f32(rng):
    e, n, f = 64, 10, 6
    data = rng.normal(size=(e, f)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)

    out = masked_segment_sum(
        jnp.array(data).astype(jnp.bfloat16), jnp.array(seg), n
    )
    assert out.dtype == jnp.bfloat16
    expected = np.zeros((n, f), np.float32)
    for i in range(e):
        expected[seg[i]] += data[i].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32), expected, rtol=2e-2, atol=2e-2
    )


def test_segment_softmax_bf16_matches_f32(rng):
    e, n = 50, 8
    scores = rng.normal(size=(e, 4)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    mask = rng.random(e) > 0.2

    out16 = segment_softmax(
        jnp.array(scores).astype(jnp.bfloat16), jnp.array(seg), n, jnp.array(mask)
    )
    out32 = segment_softmax(jnp.array(scores), jnp.array(seg), n, jnp.array(mask))
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16).astype(np.float32), np.asarray(out32), atol=1e-2
    )


def test_take_rows_bf16_multidim_index(rng):
    """[P, B]-shaped index tables (the halo send gather) through the packed
    bf16 fast path must match jnp.take exactly."""
    from graphphysics_tpu.ops.segment import take_rows

    n, h = 9, 8
    x = jnp.array(rng.normal(size=(n, h)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.array(rng.integers(0, n, size=(3, 5)).astype(np.int32))

    out = take_rows(x, idx)
    ref = jnp.take(x, idx, axis=0)
    assert out.shape == (3, 5, h)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint16), np.asarray(ref).view(np.uint16)
    )

    # gradient: scatter-add over the flattened index
    w = rng.normal(size=(3, 5, h)).astype(np.float32)

    def loss(xf):
        return (take_rows(xf.astype(jnp.bfloat16), idx).astype(jnp.float32) * w).sum()

    g = jax.jit(jax.grad(loss))(jnp.array(rng.normal(size=(n, h)).astype(np.float32)))
    expected = np.zeros((n, h), np.float32)
    for i in range(3):
        for j in range(5):
            expected[int(idx[i, j])] += w[i, j]
    np.testing.assert_allclose(np.asarray(g), expected, rtol=2e-2, atol=2e-2)
