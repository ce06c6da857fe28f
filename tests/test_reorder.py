"""Locality-aware node reordering before edge partitioning
(``parallel/reorder.py``): permutation correctness, model equivariance,
halo-volume reduction, and exact parity of the reordered partitioned step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphphysics_tpu.core.graph import pad_graph_np
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.parallel import make_mesh, shard_batch
from graphphysics_tpu.parallel.dp import graph_parallel_forward
from graphphysics_tpu.parallel.graph_partition import (
    partition_graph_halo_np,
)
from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
from graphphysics_tpu.parallel.reorder import (
    halo_volume,
    inverse_permutation,
    locality_permutation,
    permute_graph_np,
)
from graphphysics_tpu.parallel import unpartition_rows
from graphphysics_tpu.topology.build import face_to_edge, to_undirected


def _grid_mesh_shuffled(nx=32, ny=32, seed=0, shuffle=True):
    """2D triangulated grid whose node NUMBERING is randomly shuffled —
    the worst case for contiguous-block partitioning."""
    n = nx * ny
    iy, ix = np.divmod(np.arange(n), nx)
    pos = np.stack([ix, iy], axis=1).astype(np.float32)
    faces = []
    for y in range(ny - 1):
        for x in range(nx - 1):
            a, b, c, d = (
                y * nx + x, y * nx + x + 1, (y + 1) * nx + x,
                (y + 1) * nx + x + 1,
            )
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.asarray(faces, np.int64)  # [F, 3]
    s, r = face_to_edge(faces)
    if shuffle:
        rng = np.random.default_rng(seed)
        relabel = rng.permutation(n)
        s, r = relabel[s], relabel[r]
        pos_new = np.empty_like(pos)
        pos_new[relabel] = pos
        pos = pos_new
    x = np.random.default_rng(seed + 1).normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = 0
    y = np.random.default_rng(seed + 2).normal(size=(n, 2)).astype(np.float32)
    ea = np.random.default_rng(seed + 3).normal(
        size=(len(s), 3)
    ).astype(np.float32)
    return pad_graph_np(
        x, pos, s.astype(np.int32), r.astype(np.int32), n, len(s) + 64,
        edge_attr=ea, y=y, node_type_index=2,
    )


@pytest.mark.parametrize("method", ["rcm", "bfs", "hilbert"])
def test_permutation_is_bijection(method):
    g = _grid_mesh_shuffled(nx=16, ny=16)
    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes, edge_mask=g.edge_mask,
        pos=g.pos, method=method,
    )
    assert sorted(perm.tolist()) == list(range(g.num_nodes))
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv[np.arange(g.num_nodes)]],
                                  np.arange(g.num_nodes))


def test_permute_graph_roundtrip_and_edges():
    g = _grid_mesh_shuffled(nx=16, ny=16)
    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes, edge_mask=g.edge_mask,
        method="rcm",
    )
    pg = permute_graph_np(g, perm)
    inv = inverse_permutation(perm)
    # node rows: new row i = old row perm[i]
    np.testing.assert_array_equal(np.asarray(pg.x)[inv], np.asarray(g.x))
    # edge endpoints relabeled, edge order unchanged: resolving features
    # through the permuted ids reproduces the original gather
    np.testing.assert_array_equal(
        np.asarray(pg.x)[np.asarray(pg.senders)],
        np.asarray(g.x)[np.asarray(g.senders)],
    )
    np.testing.assert_array_equal(
        np.asarray(pg.x)[np.asarray(pg.receivers)],
        np.asarray(g.x)[np.asarray(g.receivers)],
    )


def test_model_forward_equivariance():
    """forward(permuted graph) == permute(forward(graph)) — the property
    that makes reordered partitioned TRAINING exact without any unmapping."""
    g = _grid_mesh_shuffled(nx=16, ny=16)
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    params = model.init(jax.random.key(0), gj)
    ref = np.asarray(model.apply(params, gj))
    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes, edge_mask=g.edge_mask,
        method="rcm",
    )
    pg = jax.tree_util.tree_map(jnp.asarray, permute_graph_np(g, perm))
    out = np.asarray(model.apply(params, pg))
    np.testing.assert_allclose(out, ref[perm], rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("num_parts", [4, 8])
def test_rcm_reduces_halo_volume(num_parts):
    """On a shuffled-numbered grid, RCM reordering must cut the halo rows
    dramatically (the shuffled cut makes nearly every node a boundary)."""
    g = _grid_mesh_shuffled(nx=32, ny=32, shuffle=True)
    before = halo_volume(g, num_parts)
    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes, edge_mask=g.edge_mask,
        method="rcm",
    )
    after = halo_volume(permute_graph_np(g, perm), num_parts)
    assert after["rows_exchanged_real"] < 0.2 * before["rows_exchanged_real"]
    assert after["rows_exchanged_budgeted"] < before["rows_exchanged_budgeted"]
    # the reordered boundary should be a thin frontier, not most of the mesh
    assert after["real_fraction"] < 0.35


def test_reordered_partitioned_forward_matches_single_device():
    g = _grid_mesh_shuffled(nx=32, ny=32)
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    params = model.init(jax.random.key(0), gj)
    ref = np.asarray(model.apply(params, gj))

    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes, edge_mask=g.edge_mask,
        method="rcm",
    )
    pg = permute_graph_np(g, perm)
    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = shard_batch(
        jax.tree_util.tree_map(jnp.asarray, partition_graph_halo_np(pg, 4)),
        mesh, GRAPH_AXIS,
    )
    out = unpartition_rows(
        np.asarray(graph_parallel_forward(model, params, parts, mesh))
    )
    inv = inverse_permutation(perm)
    np.testing.assert_allclose(out[inv], ref, rtol=2e-4, atol=1e-5)


def test_reorder_fit_and_validation_match(tmp_path):
    # NB: no "train" in the test name — switch_to_val does a whole-path
    # "train"->"test" replace and pytest puts the test name in tmp_path
    """End-to-end: Trainer(partition_reorder='rcm') reproduces the
    unreordered partitioned trainer — per-epoch losses (training is
    permutation-equivariant) and validation RMSE (inverse mapping)."""
    import shutil

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(
        str(tmp_path), num_traj=2, steps=6, nx=10, ny=6
    )
    shutil.copy(h5_path, str(tmp_path / "test.h5"))
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 1, "hidden_size": 8,
                  "node_input_size": 2, "edge_input_size": 3,
                  "output_size": 2},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"world_pos_parameters": {"use": False}},
    }

    def run(reorder):
        train_ds = get_dataset(param, get_preprocessing(param))
        val_ds = get_dataset(
            param, get_preprocessing(param, remove_noise=True),
            switch_to_val=True,
        )
        loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
        tr = Trainer(
            param, learning_rate=1e-3, warmup=2, metrics_path=None,
            rollout_dir=None, graph_partition=4, partition_mode="halo",
            partition_reorder=reorder, partitioned_validation=True,
            checkpoint_dir=str(tmp_path / f"ck_{reorder}"), log_every=5,
        )
        hist = tr.fit(loader, val_dataset=val_ds, num_epochs=1)
        return hist

    ref = run(None)
    got = run("rcm")
    np.testing.assert_allclose(
        got["train_loss"], ref["train_loss"], rtol=5e-3
    )
    np.testing.assert_allclose(got["val_rmse"], ref["val_rmse"], rtol=1e-3)


def test_halo_volume_rejects_indivisible_parts():
    """num_nodes % num_parts != 0 must raise (matching partition_graph_np)
    instead of silently dropping out-of-range receivers from the proxy."""
    import pytest

    from graphphysics_tpu.parallel.reorder import halo_volume

    g = _grid_mesh_shuffled(6, 5, shuffle=False)  # 30 nodes
    with pytest.raises(ValueError, match="divisible"):
        halo_volume(g, 4)


def test_trainer_reorder_permutation_cached_per_topology():
    """The scipy reorder solve must run once per distinct edge topology,
    not once per batch (it sits on the host critical path)."""
    import graphphysics_tpu.parallel.reorder as reorder_mod
    from graphphysics_tpu.training.trainer import Trainer

    g = _grid_mesh_shuffled(8, 8, shuffle=False)
    param = {"model": {"type": "epd", "message_passing_num": 1,
                       "hidden_size": 8, "node_input_size": 11,
                       "edge_input_size": 3, "output_size": 2},
             "index": {"feature_index_start": 0, "feature_index_end": 2,
                       "node_type_index": 2, "output_index_start": 0,
                       "output_index_end": 2}}
    tr = Trainer(param, graph_partition=2, partition_reorder="rcm",
                 checkpoint_dir="/tmp/_reorder_cache_ckpt", metrics_path=None,
                 rollout_dir=None)
    calls = []
    orig = reorder_mod.locality_permutation

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    reorder_mod.locality_permutation = counting
    try:
        g1, p1 = tr._maybe_reorder(g)
        g2, p2 = tr._maybe_reorder(g)  # same topology -> cache hit
        assert len(calls) == 1
        np.testing.assert_array_equal(p1, p2)
        # different topology -> recompute
        g_other = _grid_mesh_shuffled(10, 10, shuffle=False)
        tr._maybe_reorder(g_other)
        assert len(calls) == 2
    finally:
        reorder_mod.locality_permutation = orig
