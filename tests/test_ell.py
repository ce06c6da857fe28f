"""ELL layout tests: construction invariants and exact agreement between the
dense ELL ops / blocks and the COO segment-op reference paths."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.graph import pad_graph_ell_np, pad_graph_np
from graphphysics_tpu.models.layers import Attention, GraphNetBlock
from graphphysics_tpu.ops.ell_ops import (
    ell_gather,
    ell_repeat,
    ell_segment_sum,
    ell_softmax,
)
from graphphysics_tpu.ops.segment import masked_segment_sum, segment_softmax
from graphphysics_tpu.topology.build import to_undirected
from graphphysics_tpu.topology.ell import build_ell


def _sym_graph(n=32, seed=0):
    r = np.random.default_rng(seed)
    s = r.integers(0, n, 3 * n).astype(np.int32)
    t = r.integers(0, n, 3 * n).astype(np.int32)
    return to_undirected(s, t)


def test_build_ell_invariants():
    n = 32
    s, r = _sym_graph(n)
    ell = build_ell(s, r, n)
    d = ell.degree
    assert len(ell.senders) == n * d
    # owners
    np.testing.assert_array_equal(ell.receivers, np.repeat(np.arange(n), d))
    # every real edge present exactly once
    real = ell.edge_mask
    got = set(zip(ell.senders[real].tolist(), ell.receivers[real].tolist()))
    assert got == set(zip(s.tolist(), r.tolist()))
    # padding slots self-reference their owner
    np.testing.assert_array_equal(ell.senders[~real], ell.receivers[~real])
    # twin invariants: senders[e] == owner(twin[e]) for ALL slots; involution
    np.testing.assert_array_equal(ell.senders, ell.receivers[ell.twin_perm])
    np.testing.assert_array_equal(ell.twin_perm[ell.twin_perm], np.arange(n * d))


def test_build_ell_rejects_asymmetric():
    s = np.array([0, 1], np.int32)
    r = np.array([1, 2], np.int32)
    try:
        build_ell(s, r, 4)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not symmetric" in str(e)


def test_ell_ops_match_coo(rng):
    n = 32
    s, r = _sym_graph(n, seed=1)
    ell = build_ell(s, r, n)
    d = ell.degree
    e_slots = n * d
    data = rng.normal(size=(e_slots, 8)).astype(np.float32)
    mask = jnp.asarray(ell.edge_mask)

    # segment sum over owners
    got = ell_segment_sum(jnp.asarray(data), d, mask)
    exp = masked_segment_sum(
        jnp.asarray(data), jnp.asarray(ell.receivers), n, mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-5, atol=1e-5)

    # softmax over owners
    scores = rng.normal(size=(e_slots,)).astype(np.float32)
    got = ell_softmax(jnp.asarray(scores), d, mask)
    exp = segment_softmax(
        jnp.asarray(scores), jnp.asarray(ell.receivers), n, mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-5, atol=1e-6)

    # repeat == take at owners
    x = rng.normal(size=(n, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ell_repeat(jnp.asarray(x), d)),
        np.asarray(jnp.take(jnp.asarray(x), jnp.asarray(ell.receivers), axis=0)),
    )


def test_ell_gather_forward_and_twin_backward(rng):
    n = 24
    s, r = _sym_graph(n, seed=2)
    ell = build_ell(s, r, n)
    d = ell.degree
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    senders = jnp.asarray(ell.senders)
    twin = jnp.asarray(ell.twin_perm)

    out = ell_gather(x, senders, twin, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(x, senders, axis=0))
    )

    # gradient must equal the true vjp of take (= segment_sum over senders)
    w = jnp.asarray(rng.normal(size=(n * d, 8)).astype(np.float32))
    g_ell = jax.grad(lambda x: (ell_gather(x, senders, twin, d) * w).sum())(x)
    g_ref = jax.grad(lambda x: (jnp.take(x, senders, axis=0) * w).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_ell), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def _coo_and_ell_graphs(n=48, seed=3):
    rng = np.random.default_rng(seed)
    s, r = _sym_graph(n, seed=seed)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = rng.integers(0, 7, n)
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    ea = rng.normal(size=(len(s), 3)).astype(np.float32)
    y = rng.normal(size=(n, 2)).astype(np.float32)
    coo = pad_graph_np(x, pos, s, r, n_pad=n, e_pad=len(s) + 16,
                       edge_attr=ea, y=y, node_type_index=2)
    ell = pad_graph_ell_np(x, pos, s, r, n_pad=n, degree=16,
                           edge_attr=ea, y=y, node_type_index=2)
    return (jax.tree_util.tree_map(jnp.asarray, coo),
            jax.tree_util.tree_map(jnp.asarray, ell))


def test_graphnet_block_ell_matches_coo():
    coo, ell = _coo_and_ell_graphs()
    h = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(coo.num_nodes, h)).astype(np.float32))
    # encode edge attrs to hidden width for the block
    ea_coo = jnp.asarray(rng.normal(size=(coo.num_edges, h)).astype(np.float32))
    # build the ELL-ordered version of the same edge features
    from graphphysics_tpu.topology.ell import build_ell as _be
    s_np = np.asarray(coo.senders)[np.asarray(coo.edge_mask)]
    r_np = np.asarray(coo.receivers)[np.asarray(coo.edge_mask)]
    layout = _be(s_np, r_np, coo.num_nodes, degree=16)
    ea_ell_np = np.zeros((coo.num_nodes * 16, h), np.float32)
    ea_ell_np[layout.edge_mask] = np.asarray(ea_coo)[
        : len(s_np)
    ][layout.edge_perm[layout.edge_mask]]
    ea_ell = jnp.asarray(ea_ell_np)

    m = GraphNetBlock(hidden_size=h)
    params = m.init(jax.random.key(0), x, ea_coo, coo.senders, coo.receivers,
                    coo.edge_mask)
    x_coo, _ = m.apply(params, x, ea_coo, coo.senders, coo.receivers,
                       coo.edge_mask)
    x_ell, _ = m.apply(params, x, ea_ell, ell.senders, ell.receivers,
                       ell.edge_mask, ell.ell_degree, ell.twin_perm)
    np.testing.assert_allclose(
        np.asarray(x_coo), np.asarray(x_ell), rtol=1e-4, atol=1e-5
    )


def test_attention_ell_matches_coo():
    coo, ell = _coo_and_ell_graphs(seed=4)
    dim = 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(coo.num_nodes, dim)).astype(np.float32))
    m = Attention(output_dim=dim, num_heads=4)
    params = m.init(jax.random.key(0), x, coo.senders, coo.receivers,
                    coo.edge_mask)
    y_coo = m.apply(params, x, coo.senders, coo.receivers, coo.edge_mask)
    y_ell = m.apply(params, x, ell.senders, ell.receivers, ell.edge_mask,
                    ell.ell_degree, ell.twin_perm)
    np.testing.assert_allclose(
        np.asarray(y_coo), np.asarray(y_ell), rtol=1e-4, atol=1e-5
    )


def test_ell_degree_budget_canonical_across_first_touched_index(tmp_path):
    """The ELL degree budget must come from the CANONICAL sample, not
    whichever item a process pads first — same cross-process static-shape
    contract as the edge/CSR budgets (multi-host compiles must match)."""
    import json

    from graphphysics_tpu.dataset.dataset import BaseDataset
    from graphphysics_tpu.dataset.sample import RawSample

    meta = str(tmp_path / "meta.json")
    with open(meta, "w") as f:
        json.dump({"trajectory_length": 3}, f)

    class Toy(BaseDataset):
        @property
        def size_dataset(self):
            return 2

        def _load(self, index):
            n = 12
            traj = index // self.frames_per_trajectory
            deg = 4 if traj == 0 else 8  # heterogeneous max in-degree
            hub_edges = np.stack(
                [np.zeros(deg, np.int32), np.arange(1, deg + 1, dtype=np.int32)]
            )
            s, r = to_undirected(hub_edges[0], hub_edges[1])
            return RawSample(
                x=np.ones((n, 1), np.float32),
                pos=np.zeros((n, 2), np.float32),
                senders=s,
                receivers=r,
                y=np.zeros((n, 1), np.float32),
                traj_index=traj,
            )

    ds_a = Toy(meta_path=meta, edge_layout="ell", add_edge_features=False)
    ds_b = Toy(meta_path=meta, edge_layout="ell", add_edge_features=False)
    ds_a[0]  # process A pads the low-degree trajectory first
    ds_b[2]  # process B pads the high-degree trajectory first
    ds_a[2]
    ds_b[0]
    assert ds_a.ell_degree == ds_b.ell_degree
    assert ds_a[2].senders.shape == ds_b[2].senders.shape
