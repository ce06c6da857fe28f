"""Size-bucketed padding (SURVEY.md §7.1 "pad nodes/edges to bucket
boundaries"): heterogeneous-size trajectories pad to per-bucket budgets
instead of the global max, and the loader keeps every batch one shape."""

import numpy as np
import pytest

from graphphysics_tpu.dataset import GraphLoader
from graphphysics_tpu.training.parse_parameters import (
    get_dataset,
    get_preprocessing,
)
from graphphysics_tpu.training.trainer import Trainer
from tests.fixtures import write_cylinder_h5

# two distinct mesh sizes: 6x5=30 and 14x10=140 nodes
GRIDS = [(6, 5), (6, 5), (14, 10), (14, 10)]


def _param(h5_path, meta_path, num_buckets=2):
    return {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1,
                    "num_buckets": num_buckets},
        "model": {"type": "epd", "message_passing_num": 1, "hidden_size": 8,
                  "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {
            "preprocessing": {"noise": 0.02, "noise_index_start": [0],
                              "noise_index_end": [2], "masking": 0},
            "world_pos_parameters": {"use": False},
        },
    }


@pytest.fixture(scope="module")
def mixed_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    h5_path, meta_path = write_cylinder_h5(str(d), steps=6, grids=GRIDS)
    return h5_path, meta_path


def _make_ds(mixed_env, **kw):
    h5_path, meta_path = mixed_env
    param = _param(h5_path, meta_path)
    param["dataset"].update(kw)
    return get_dataset(param, get_preprocessing(param)), param


def test_bucket_assignment_and_item_shapes(mixed_env):
    ds, _ = _make_ds(mixed_env, bucket_multiple=64)
    small = ds[0]  # trajectory 0 (30 nodes)
    big = ds[ds.trajectory_indices(2)[0]]  # trajectory 2 (140 nodes)
    assert small.x.shape[0] == 64
    assert big.x.shape[0] == 192
    assert small.senders.shape[0] < big.senders.shape[0]
    assert ds.num_buckets == 2
    assert ds.bucket_of_index(0) == 0
    assert ds.bucket_of_index(ds.trajectory_indices(2)[0]) == 1
    # real rows intact under the smaller budget
    assert int(small.node_mask.sum()) == 30
    assert int(big.node_mask.sum()) == 140


def test_bucket_budget_reduction_to_requested_count(mixed_env):
    # 2 distinct sizes but only 1 bucket requested -> single global budget
    ds, _ = _make_ds(mixed_env, num_buckets=1)
    assert ds[0].x.shape == ds[ds.trajectory_indices(2)[0]].x.shape


def test_bucket_collapse_on_uniform_sizes(tmp_path):
    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=2, steps=4,
                                           nx=6, ny=5)
    param = _param(h5_path, meta_path, num_buckets=4)
    ds = get_dataset(param, get_preprocessing(param))
    _ = ds[0]
    assert ds.num_buckets == 1  # collapsed; global budget path
    assert ds.node_budget is not None


def test_loader_groups_batches_by_bucket(mixed_env):
    ds, _ = _make_ds(mixed_env, bucket_multiple=64)
    loader = GraphLoader(ds, batch_size=2, shuffle=True, prefetch=0, seed=3)
    # 4 traj x 5 frames = 20 items, 10 per bucket -> 5 + 5 batches
    assert len(loader) == 10
    seen = {64: 0, 192: 0}
    for epoch in range(2):
        loader.set_epoch(epoch)
        shapes = []
        for batch in loader:
            # concat collate: one flat graph; its node count reveals the
            # bucket, and concat only succeeds for same-shape members
            n = batch.x.shape[0] // 2
            assert n in seen
            seen[n] += 1
            shapes.append(n)
        assert sorted(set(shapes)) == [64, 192]
    assert seen[64] == seen[192] == 10


def test_xdmf_bucket_assignment(tmp_path):
    """XDMF datasets scan per-file node counts for the bucket tables."""
    from tests.fixtures import write_aneurysm_xdmf

    folder, meta_path = write_aneurysm_xdmf(str(tmp_path), steps=4,
                                            sizes=[3, 5])
    param = {
        "dataset": {"extension": "xdmf", "xdmf_folder": folder,
                    "meta_path": meta_path, "khop": 1, "num_buckets": 2,
                    # tet grids are degree-heterogeneous across sizes (surface/
                    # volume ratio): the cross-bucket edges-per-node
                    # extrapolation needs slack, as the overflow error directs
                    "bucket_multiple": 32, "edge_headroom": 1.6},
        "model": {}, "index": {"feature_index_start": 0,
                               "feature_index_end": 3,
                               "output_index_start": 0, "output_index_end": 3,
                               "node_type_index": 3},  # wall_mask column
        "transformations": {
            "preprocessing": {"noise": 0.0, "noise_index_start": [0],
                              "noise_index_end": [3], "masking": 0},
            "world_pos_parameters": {"use": False},
        },
    }
    ds = get_dataset(param, get_preprocessing(param))
    small = ds[0]
    big = ds[ds.trajectory_indices(1)[0]]
    assert ds.num_buckets == 2
    assert small.x.shape[0] < big.x.shape[0]
    # real node counts intact: tet_grid(3) -> 27 nodes, tet_grid(5) -> 125
    assert int(small.node_mask.sum()) == 27
    assert int(big.node_mask.sum()) == 125


def test_small_bucket_never_silently_dropped(mixed_env):
    """drop_last must not delete an entire mesh-size class: a bucket smaller
    than one batch still yields its partial batch."""
    ds, _ = _make_ds(mixed_env, bucket_multiple=64)
    # 10 items per bucket, batch_size 16 > bucket -> one partial batch each,
    # padded to the full batch size with masked filler (static shapes)
    loader = GraphLoader(ds, batch_size=16, shuffle=False, prefetch=0)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    per_node = sorted(b.x.shape[0] // 16 for b in batches)
    assert per_node == [64, 192]
    # the 10 real graphs are intact; the 6 filler graphs carry no valid nodes
    for b in batches:
        n = b.x.shape[0] // 16
        valid = b.node_mask.reshape(16, n).sum(axis=1)
        assert all(valid[:10] > 0) and all(valid[10:] == 0)
    # ... while a bucket with >= 1 full batch still drops its tail
    loader8 = GraphLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    assert len(loader8) == 2  # 10 // 8 = 1 per bucket, tails dropped


def test_peek_falls_back_when_no_full_batch(mixed_env):
    """peek() must return a shape-init batch even when drop_last leaves no
    chunks (dataset smaller than one batch) — Trainer.init_state relies on
    it."""
    ds, _ = _make_ds(mixed_env, num_buckets=1)
    loader = GraphLoader(ds, batch_size=1000, shuffle=False, prefetch=0)
    assert len(loader) == 0
    g = loader.peek()
    assert g.x.shape[0] > 0


def test_bucketed_multiworker_loader(mixed_env):
    """Worker processes inherit the materialized bucket tables (fork after
    _materialize_static_shapes) and keep batches bucket-pure."""
    ds, _ = _make_ds(mixed_env, bucket_multiple=64)
    loader = GraphLoader(ds, batch_size=2, shuffle=True, prefetch=1,
                         num_workers=2, seed=5)
    shapes = set()
    for batch in loader:
        n = batch.x.shape[0] // 2
        assert n in (64, 192)
        shapes.add(n)
    assert shapes == {64, 192}


def test_bucketed_fit_and_validation_e2e(mixed_env, tmp_path):
    """Trainer fit + rollout validation over a mixed-size dataset: one
    compiled step per bucket, sequential-fallback validation across buckets
    (trajectory shapes differ), finite and decreasing losses."""
    import shutil, os

    h5_path, meta_path = mixed_env
    d = str(tmp_path / "run")
    os.makedirs(d)
    shutil.copy(h5_path, os.path.join(d, "data.h5"))
    shutil.copy(h5_path, os.path.join(d, "test.h5"))
    param = _param(os.path.join(d, "data.h5"), meta_path)
    train_ds = get_dataset(param, get_preprocessing(param))
    val_ds = get_dataset(param, get_preprocessing(param, remove_noise=True),
                         switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=2,
        checkpoint_dir=str(tmp_path / "ckpt"), metrics_path=None,
        rollout_dir=str(tmp_path / "meshes"), log_every=100,
    )
    hist = trainer.fit(loader, val_dataset=val_ds, num_epochs=2)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert all(np.isfinite(v) for v in hist["val_rmse"])

    # bucket-grouped parallel validation chunks must reproduce the
    # sequential metrics on the mixed-size dataset
    import jax

    if len(jax.devices()) >= 2:
        trainer.parallel_validation = False
        rmse_seq = trainer.validate(val_ds, save_rollout=False)
        vloss_seq = trainer.last_val_loss
        trainer.parallel_validation = True
        rmse_par = trainer.validate(val_ds, save_rollout=False)
        chunks = trainer._traj_chunks(val_ds, val_ds.size_dataset, 8)
        assert chunks == [[0, 1], [2, 3]]  # grouped by bucket
        assert rmse_par == pytest.approx(rmse_seq, rel=1e-5)
        assert trainer.last_val_loss == pytest.approx(vloss_seq, rel=1e-5)


def test_budgets_canonical_across_first_touched_index(mixed_env):
    """Lazily-derived static budgets must not depend on which item a process
    pads first — multi-host runs derive them independently and mismatched
    budgets compile mismatched programs."""
    ds_a, _ = _make_ds(mixed_env, bucket_multiple=64)
    ds_b, _ = _make_ds(mixed_env, bucket_multiple=64)
    big_idx = ds_b.trajectory_indices(2)[0]
    ds_a[0]  # host A pads a SMALL trajectory first
    ds_b[big_idx]  # host B pads a BIG trajectory first
    ds_a[big_idx]
    ds_b[0]
    assert ds_a._bucket_node_budgets == ds_b._bucket_node_budgets
    assert ds_a._bucket_edge_budgets == ds_b._bucket_edge_budgets
    # and the padded shapes agree item-for-item
    for i in (0, big_idx):
        ga, gb = ds_a[i], ds_b[i]
        assert ga.x.shape == gb.x.shape
        assert ga.senders.shape == gb.senders.shape


def test_partial_bucket_batch_padded_with_masked_filler(mixed_env):
    """A bucket smaller than one batch yields a FULL-size batch padded with
    fully-masked filler graphs (static shapes for DP sharding; filler
    contributes nothing to loss/normalizer)."""
    ds, _ = _make_ds(mixed_env, bucket_multiple=64)
    # batch_size 16 > the 10 items per bucket -> whole_bucket partial chunks
    loader = GraphLoader(ds, batch_size=16, shuffle=False, prefetch=0,
                         collate="stack")
    batches = list(loader)
    assert len(batches) == 2  # one partial chunk per bucket, both yielded
    for b in batches:
        assert b.x.shape[0] == 16  # static batch dimension
        per_graph_valid = b.node_mask.sum(axis=1)
        assert all(per_graph_valid[:10] > 0)  # real graphs intact
        assert all(per_graph_valid[10:] == 0)  # filler fully masked
        assert b.edge_mask[10:].sum() == 0
