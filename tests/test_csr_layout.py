"""edge_layout="csr": sender-sorted CSR dataset layout routing transformer
attention through the fused Pallas kernel. Kernel runs in interpret mode on
CPU (real-TPU parity/perf: benchmarks/attention_kernel.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from graphphysics_tpu.core.graph import (
    concat_graphs,
    flatten_batched_graph,
    pad_graph_csr_np,
    pad_graph_np,
    stack_graphs,
)
from graphphysics_tpu.models.processors import EncodeTransformDecode
from graphphysics_tpu.ops.pallas_attention import (
    BLOCK_NODES,
    compute_block_bounds,
    compute_max_chunks_bounds,
)


def _raw(n, e, f=5, seed=0):
    r = np.random.default_rng(seed)
    x = r.normal(size=(n, f)).astype(np.float32)
    x[:, 2] = r.integers(0, 3, n)  # node-type-ish column
    pos = r.normal(size=(n, 2)).astype(np.float32)
    senders = r.integers(0, n, e).astype(np.int32)
    receivers = r.integers(0, n, e).astype(np.int32)
    return x, pos, senders, receivers


def test_pad_graph_csr_sorted_and_offsets():
    x, pos, s, r = _raw(300, 2000)
    g = pad_graph_csr_np(x, pos, s, r, n_pad=512, e_pad=2048)
    sj = np.asarray(g.senders)
    assert np.all(np.diff(sj) >= 0)  # ascending incl. padding (sender 511)
    np.testing.assert_array_equal(
        np.asarray(g.csr_bounds),
        compute_block_bounds(sj, 512, num_real_edges=2000),
    )
    # block ranges stop before the trailing padding edges
    assert np.asarray(g.csr_bounds)[1].max() == 2000
    assert g.csr_max_chunks >= 1
    # edge set preserved (as multiset of pairs)
    got = sorted(zip(sj[: len(s)].tolist(), np.asarray(g.receivers)[: len(s)]))
    want = sorted(zip(np.sort(s).tolist(), r[np.argsort(s, kind="stable")]))
    assert got == want


def test_pad_graph_csr_rejects_partial_blocks():
    x, pos, s, r = _raw(100, 500)
    with pytest.raises(ValueError, match="multiple"):
        pad_graph_csr_np(x, pos, s, r, n_pad=200, e_pad=512)


def _model_and_graphs(n=300, e=2000, hidden=32, heads=4, seed=0):
    x, pos, s, r = _raw(n, e, seed=seed)
    g_coo = pad_graph_np(x, pos, s, r, n_pad=512, e_pad=2048)
    g_csr = pad_graph_csr_np(x, pos, s, r, n_pad=512, e_pad=2048)
    model = EncodeTransformDecode(
        message_passing_num=2,
        node_input_size=x.shape[1],
        output_size=3,
        hidden_size=hidden,
        num_heads=heads,
    )
    params = model.init(jax.random.key(0), jax.device_put(g_coo))
    return model, params, g_coo, g_csr, n


def test_transformer_forward_parity_coo_vs_csr():
    model, params, g_coo, g_csr, n = _model_and_graphs()
    out_coo = model.apply(params, jax.device_put(g_coo))
    with pltpu.force_tpu_interpret_mode():
        out_csr = model.apply(params, jax.device_put(g_csr))
    np.testing.assert_allclose(
        np.asarray(out_csr)[:n], np.asarray(out_coo)[:n], rtol=1e-4, atol=1e-4
    )


def test_transformer_grad_parity_coo_vs_csr():
    model, params, g_coo, g_csr, n = _model_and_graphs(n=200, e=1200)

    def loss(p, g):
        out = model.apply(p, g)
        return (out ** 2).sum()

    g_x = jax.grad(loss)(params, jax.device_put(g_coo))
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss)(params, jax.device_put(g_csr))
    lx = jax.tree_util.tree_leaves(g_x)
    lp = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(lp, lx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_concat_graphs_merges_csr_bounds():
    x1, pos1, s1, r1 = _raw(300, 2000, seed=1)
    x2, pos2, s2, r2 = _raw(280, 1800, seed=2)
    g1 = pad_graph_csr_np(x1, pos1, s1, r1, n_pad=512, e_pad=2048)
    g2 = pad_graph_csr_np(x2, pos2, s2, r2, n_pad=512, e_pad=2048)
    g2 = g2.replace(csr_max_chunks=g1.csr_max_chunks)  # dataset unifies this
    gb = concat_graphs([g1, g2])
    sj = np.asarray(gb.senders)
    assert np.all(np.diff(sj) >= 0)
    expected = np.concatenate(
        [np.asarray(g1.csr_bounds), np.asarray(g2.csr_bounds) + 2048], axis=1
    )
    np.testing.assert_array_equal(np.asarray(gb.csr_bounds), expected)
    # each member's padding edges stay outside every range
    ends = np.asarray(gb.csr_bounds)[1]
    assert ends[1] <= 2000 and ends[-1] <= 2048 + 1800
    assert gb.csr_max_chunks == g1.csr_max_chunks + 1

    # batched forward parity vs the XLA path on the same concat graph
    model = EncodeTransformDecode(
        message_passing_num=1, node_input_size=x1.shape[1], output_size=3,
        hidden_size=16, num_heads=4,
    )
    gb_coo = gb.replace(csr_bounds=None, csr_max_chunks=None)
    params = model.init(jax.random.key(0), jax.device_put(gb_coo))
    out_coo = model.apply(params, jax.device_put(gb_coo))
    with pltpu.force_tpu_interpret_mode():
        out_csr = model.apply(params, jax.device_put(gb))
    np.testing.assert_allclose(
        np.asarray(out_csr), np.asarray(out_coo), rtol=1e-4, atol=1e-4
    )


def test_flatten_batched_graph_csr_bounds():
    x1, pos1, s1, r1 = _raw(300, 2000, seed=3)
    x2, pos2, s2, r2 = _raw(290, 1900, seed=4)
    g1 = pad_graph_csr_np(x1, pos1, s1, r1, n_pad=512, e_pad=2048)
    g2 = pad_graph_csr_np(x2, pos2, s2, r2, n_pad=512, e_pad=2048)
    g2 = g2.replace(csr_max_chunks=g1.csr_max_chunks)
    stacked = stack_graphs([g1, g2])
    flat = jax.jit(flatten_batched_graph)(jax.device_put(stacked))
    expected = concat_graphs([g1, g2])
    np.testing.assert_array_equal(
        np.asarray(flat.csr_bounds), np.asarray(expected.csr_bounds)
    )
    np.testing.assert_array_equal(
        np.asarray(flat.senders), np.asarray(expected.senders)
    )


def test_dataset_csr_layout_end_to_end(tmp_path):
    """H5 dataset with edge_layout='csr': budgets rounded to whole blocks,
    items carry offsets, and the loader batches them."""
    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1, steps=4,
                                           nx=8, ny=6)
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1,
                    "edge_layout": "csr"},
        "model": {"type": "transformer", "message_passing_num": 1,
                  "hidden_size": 16, "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 0, "num_heads": 4},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0.02,
                                              "noise_index_start": [0],
                                              "noise_index_end": [2],
                                              "masking": 0},
                            "world_pos_parameters": {"use": False}},
    }
    ds = get_dataset(param, get_preprocessing(param))
    g = ds[0]
    assert ds.edge_layout == "csr"
    assert ds.node_budget % BLOCK_NODES == 0
    assert g.csr_bounds is not None and g.csr_max_chunks == ds.csr_max_chunks
    assert np.all(np.diff(np.asarray(g.senders)) >= 0)
    batch = GraphLoader(ds, batch_size=2, prefetch=0).peek()
    assert batch.csr_bounds is not None
    assert np.all(np.diff(np.asarray(batch.senders)) >= 0)


def test_csr_chunk_budget_independent_of_padding():
    """A small sample padded into a large edge budget must not need more
    chunks than the same sample at a tight budget (padding edges are excluded
    from every block range) — the heterogeneous-trajectory regression."""
    x, pos, s, r = _raw(300, 2000, seed=6)
    g_tight = pad_graph_csr_np(x, pos, s, r, n_pad=512, e_pad=2048)
    g_loose = pad_graph_csr_np(x, pos, s, r, n_pad=512, e_pad=6144)
    assert g_loose.csr_max_chunks <= g_tight.csr_max_chunks + 1
    assert compute_max_chunks_bounds(np.asarray(g_loose.csr_bounds)) == (
        g_loose.csr_max_chunks
    )


def _auto_param(h5_path, meta_path, model_type="transformer", **ds_extra):
    dataset = {"extension": "h5", "h5_path": h5_path, "meta_path": meta_path,
               "khop": 1, "edge_layout": "auto", **ds_extra}
    return {
        "dataset": dataset,
        "model": {"type": model_type, "message_passing_num": 1,
                  "hidden_size": 16, "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 0 if model_type == "transformer" else 3,
                  "num_heads": 4},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0.02,
                                              "noise_index_start": [0],
                                              "noise_index_end": [2],
                                              "masking": 0},
                            "world_pos_parameters": {"use": False}},
    }


def test_auto_edge_layout_resolution(tmp_path):
    """edge_layout='auto' picks the fused-Pallas CSR path only for
    transformer models on meshes at or above the threshold; EPD and
    small meshes stay on the XLA-fused COO path."""
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1,
                                           steps=4, nx=8, ny=6)
    # the fixture mesh is 48 nodes: above a tiny threshold -> csr
    param = _auto_param(h5_path, meta_path, auto_csr_min_nodes=16)
    ds = get_dataset(param, get_preprocessing(param))
    assert ds.edge_layout == "csr"
    assert ds[0].csr_bounds is not None
    # below the default (32768-node) threshold -> coo
    param = _auto_param(h5_path, meta_path)
    ds = get_dataset(param, get_preprocessing(param))
    assert ds.edge_layout == "coo"
    # EPD never routes through the CSR attention kernel -> coo
    param = _auto_param(h5_path, meta_path, model_type="epd",
                        auto_csr_min_nodes=16)
    ds = get_dataset(param, get_preprocessing(param))
    assert ds.edge_layout == "coo"


def test_set_edge_layout_guards(tmp_path):
    """set_edge_layout refuses once an item has been padded (earlier items
    would have a different static shape) but is free before that."""
    import pytest

    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1,
                                           steps=4, nx=8, ny=6)
    param = _auto_param(h5_path, meta_path)
    param["dataset"]["edge_layout"] = "coo"
    ds = get_dataset(param, get_preprocessing(param))
    ds.set_edge_layout("csr")
    ds.set_edge_layout("coo")
    ds[0]
    ds.set_edge_layout("coo")  # no-op stays allowed
    with pytest.raises(ValueError, match="before the first item"):
        ds.set_edge_layout("csr")


def test_auto_layout_aligns_explicit_node_budget(tmp_path):
    """A config with an explicit (coo-legal) node_budget must keep working
    when auto resolves to csr: the budget rounds up to whole kernel blocks
    instead of erroring at the first item."""
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1,
                                           steps=4, nx=8, ny=6)
    param = _auto_param(h5_path, meta_path, auto_csr_min_nodes=16)
    ds = get_dataset(param, get_preprocessing(param), node_budget=100)
    assert ds.edge_layout == "csr"
    assert ds.node_budget % BLOCK_NODES == 0 and ds.node_budget >= 100
    assert ds[0].csr_bounds is not None
