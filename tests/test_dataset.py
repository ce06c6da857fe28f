"""Dataset-layer integration tests on generated fixtures (the analog of the
reference tests/graphphysics/dataset/test_h5dataset.py / test_xdmfdataset.py)."""

import numpy as np
import pytest

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.dataset import (
    GraphLoader,
    H5Dataset,
    XDMFDataset,
    build_preprocessing,
)
from tests.fixtures import (
    write_aneurysm_xdmf,
    write_cylinder_h5,
    write_panels_xdmf,
    write_plate_h5,
)


@pytest.fixture(scope="module")
def cylinder(tmp_path_factory):
    d = tmp_path_factory.mktemp("cyl")
    return write_cylinder_h5(str(d))


@pytest.fixture(scope="module")
def plate(tmp_path_factory):
    d = tmp_path_factory.mktemp("plate")
    return write_plate_h5(str(d))


@pytest.fixture(scope="module")
def aneurysm(tmp_path_factory):
    d = tmp_path_factory.mktemp("aneu")
    return write_aneurysm_xdmf(str(d))


def _cyl_preproc(noise=0.0):
    noise_params = None
    if noise:
        noise_params = {
            "noise_index_start": [0],
            "noise_index_end": [2],
            "noise_scale": noise,
            "node_type_index": 2,
        }
    return build_preprocessing(noise_parameters=noise_params)


def test_h5_dataset_shapes_and_layout(cylinder):
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path,
        meta_path=meta_path,
        preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    assert len(ds) == 2 * 11
    g = ds[0]
    # padded budgets are multiples of 128
    assert g.num_nodes % 128 == 0 and g.num_edges % 128 == 0
    n_real = int(g.node_mask.sum())
    assert n_real == 96  # 12 x 8 grid
    # x layout: [vel(2), node_type, time]
    assert g.x.shape[1] == 4
    assert g.y.shape[1] == 2
    # edge features: rel pos (2) + distance (1)
    assert g.edge_attr.shape[1] == 3
    # padding node types marked
    assert np.all(g.x[n_real:, 2] == int(NodeType.PADDING))
    # time column constant = frame * dt
    np.testing.assert_allclose(g.x[:n_real, 3], 0.0)
    g5 = ds[5]
    np.testing.assert_allclose(g5.x[: int(g5.node_mask.sum()), 3], 5 * 0.01, rtol=1e-5)


def test_h5_dataset_target_is_next_frame(cylinder):
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    g0, g1 = ds[0], ds[1]
    n = int(g0.node_mask.sum())
    np.testing.assert_allclose(g0.y[:n], g1.x[:n, 0:2], rtol=1e-5)


def test_noise_only_on_normal_nodes(cylinder):
    h5_path, meta_path = cylinder
    clean = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(0.0),
        node_type_index=2,
    )
    noisy = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(0.5),
        node_type_index=2,
    )
    gc, gn = clean[0], noisy[0]
    n = int(gc.node_mask.sum())
    nt = gc.x[:n, 2]
    normal = nt == int(NodeType.NORMAL)
    diff = np.abs(gc.x[:n, 0:2] - gn.x[:n, 0:2]).max(axis=1)
    assert np.all(diff[~normal] == 0.0)
    assert diff[normal].max() > 1e-3


def test_khop_increases_edges_and_caches(cylinder):
    h5_path, meta_path = cylinder
    ds1 = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    ds2 = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        khop=2, node_type_index=2,
    )
    e1 = int(ds1[0].edge_mask.sum())
    e2 = int(ds2[0].edge_mask.sum())
    assert e2 > e1
    assert 0 in ds2._khop_edges_cache
    # second access from the same trajectory must reuse the cache
    g = ds2[1]
    assert int(g.edge_mask.sum()) == e2


def test_random_edges_add_edges(cylinder):
    h5_path, meta_path = cylinder
    base = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    aug = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        new_edges_ratio=0.2, node_type_index=2, edge_headroom=1.5,
    )
    assert int(aug[0].edge_mask.sum()) > int(base[0].edge_mask.sum())


def test_masking_produces_exclude_mask(cylinder):
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        masking_ratio=0.25, node_type_index=2,
    )
    g = ds[0]
    n = int(g.node_mask.sum())
    assert g.exclude_mask is not None
    kept = int(g.exclude_mask.sum())
    assert kept == int(0.75 * n)
    assert not g.exclude_mask[n:].any()


def test_loader_batches_by_concatenation(cylinder):
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    loader = GraphLoader(ds, batch_size=4, shuffle=True, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    single = ds[0]
    assert b.num_nodes == 4 * single.num_nodes
    assert b.num_edges == 4 * single.num_edges
    # edges of graph k offset into [k*N, (k+1)*N)
    n = single.num_nodes
    for k in range(4):
        seg = slice(k * single.num_edges, (k + 1) * single.num_edges)
        sub = b.senders[seg]
        assert sub.min() >= k * n and sub.max() < (k + 1) * n


def test_plate_world_pipeline(plate):
    h5_path, meta_path = plate
    wpp = {"world_pos_index_start": 0, "world_pos_index_end": 3, "node_type_index": 6}
    pre = build_preprocessing(world_pos_parameters={**wpp, "radius": 0.5})
    ds = H5Dataset(
        h5_path=h5_path,
        meta_path=meta_path,
        preprocessing=pre,
        node_type_index=6,
        edge_headroom=2.0,
    )
    g = ds[0]
    n = int(g.node_mask.sum())
    # x layout after add_obstacles_next_pos: [world_pos(3), obstacle_disp(3), node_type, time]
    assert g.x.shape[1] == 8
    nt = g.x[:n, 6]
    assert set(np.unique(nt)).issubset(
        {float(NodeType.NORMAL), float(NodeType.HANDLE), float(NodeType.OBSTACLE)}
    )
    # obstacle displacement equals target - current world pos on obstacle nodes
    obstacle = nt == float(NodeType.OBSTACLE)
    disp = g.x[:n, 3:6][obstacle]
    np.testing.assert_allclose(disp, g.y[:n][obstacle] - g.x[:n, 0:3][obstacle],
                               rtol=1e-4, atol=1e-6)
    # edge features: cartesian(3)+dist(1)+world rel(3)+world dist(1)
    assert g.edge_attr.shape[1] == 8


def test_xdmf_roundtrip_and_dataset(aneurysm):
    folder, meta_path = aneurysm
    from graphphysics_tpu.external.aneurysm import build_features

    pre = build_preprocessing(
        add_edges_features=False, extra_node_features=build_features
    )
    ds = XDMFDataset(
        xdmf_folder=folder,
        meta_path=meta_path,
        preprocessing=pre,
        add_edge_features=False,
        use_previous_data=True,
        node_type_index=14,
    )
    assert ds.size_dataset == 2
    g = ds[0]
    n = int(g.node_mask.sum())
    assert n == 64  # 4^3 grid
    # x layout: [Vitesse(3), wall(1), time(1), accel(3), pos(3), mean, min, max, nt]
    assert g.x.shape[1] == 15
    assert g.edge_attr is None
    nt = g.x[:n, 14]
    assert (nt == float(NodeType.WALL_BOUNDARY)).any()


def test_xdmf_previous_data_acceleration(aneurysm):
    folder, meta_path = aneurysm
    from graphphysics_tpu.external.aneurysm import build_features

    pre = build_preprocessing(
        add_edges_features=False, extra_node_features=build_features
    )
    ds = XDMFDataset(
        xdmf_folder=folder, meta_path=meta_path, preprocessing=pre,
        add_edge_features=False, use_previous_data=True, node_type_index=14,
    )
    # use_previous_data shifts frames by one: item 0 -> frame 1
    traj, frame = ds.get_traj_frame(0)
    assert (traj, frame) == (0, 1)
    g = ds[0]
    n = int(g.node_mask.sum())
    # acceleration column = current velocity - previous velocity
    raw = ds._load(0)
    assert np.isfinite(g.x[:n, 5:8]).all()


def test_loader_multiprocess_workers(cylinder):
    """Worker-process loading must produce the same batches as in-process
    (h5 included: handles reopen per process)."""
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    base = list(GraphLoader(ds, batch_size=4, shuffle=True, seed=3, prefetch=0))
    ds2 = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    ds2.node_budget, ds2.edge_budget = ds.node_budget, ds.edge_budget
    mp = list(
        GraphLoader(ds2, batch_size=4, shuffle=True, seed=3, prefetch=1,
                    num_workers=2)
    )
    assert len(base) == len(mp)
    for a, b in zip(base, mp):
        np.testing.assert_allclose(a.x, b.x)
        np.testing.assert_array_equal(a.senders, b.senders)


def test_worker_pickle_drops_h5_handle(cylinder):
    """Spawn workers receive the dataset by pickling: __getstate__ must drop
    the open h5 handle + trajectory cache so each worker process reopens its
    own file description (HDF5 handles cannot be shared across processes)."""
    import pickle

    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    ref = ds[0]  # opens the handle + fills the trajectory cache in the parent
    assert ds._file is not None
    worker_ds = pickle.loads(pickle.dumps(ds))
    assert worker_ds._file is None and len(worker_ds._traj_cache) == 0
    item = worker_ds[0]  # worker-side access reopens cleanly
    np.testing.assert_allclose(item.x, ref.x)


def test_mixed_size_budget_scan(tmp_path):
    """Datasets with different node counts per trajectory must size budgets
    from the LARGEST trajectory (not the first item served), so later
    trajectories never blow the static budget."""
    import h5py, json
    from tests.fixtures import triangulated_grid, cylinder_node_types, synth_velocity

    steps = 6
    h5p = str(tmp_path / "data.h5")
    sizes = []
    with h5py.File(h5p, "w") as f:
        for tr, (nx, ny) in enumerate([(8, 6), (14, 10)]):  # small first!
            points, tris = triangulated_grid(nx, ny)
            sizes.append(len(points))
            g = f.create_group(str(tr))
            g["cells"] = np.repeat(tris[None], steps, axis=0)
            g["mesh_pos"] = np.repeat(points[None], steps, axis=0)
            g["node_type"] = np.repeat(
                cylinder_node_types(points)[None, :, None], steps, axis=0
            )
            g["velocity"] = np.stack(
                [synth_velocity(points, 0.05 * t) for t in range(steps)]
            )
    meta = {
        "dt": 0.01,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 2], "dtype": "float32"},
            "node_type": {"type": "static", "shape": [steps, -1, 1], "dtype": "int32"},
            "velocity": {"type": "dynamic", "shape": [steps, -1, 2], "dtype": "float32"},
        },
        "field_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "trajectory_length": steps,
    }
    mp = str(tmp_path / "meta.json")
    json.dump(meta, open(mp, "w"))
    ds = H5Dataset(h5_path=h5p, meta_path=mp, preprocessing=_cyl_preproc(),
                   node_type_index=2)
    g_small = ds[0]  # first trajectory (small) sets budgets
    assert ds.node_budget >= max(sizes)
    # an item from the LARGER trajectory must fit the same static shapes
    g_big = ds[ds.frames_per_trajectory]
    assert g_big.x.shape == g_small.x.shape
    assert g_big.senders.shape == g_small.senders.shape


def test_plate_press_dataset(tmp_path):
    """The press generator produces real deformation physics: HANDLE bottom
    fixed, NORMAL plate nodes deform only after punch contact, and world
    edges connect the punch to the plate."""
    from graphphysics_tpu.utils.synthetic import write_plate_press_h5

    h5_path, meta_path = write_plate_press_h5(
        str(tmp_path), num_traj=1, steps=12, nx=8, nz=3, seed=1
    )
    wpp = {"world_pos_index_start": 0, "world_pos_index_end": 3,
           "node_type_index": 6}
    pre = build_preprocessing(world_pos_parameters={**wpp, "radius": 0.08})
    ds = H5Dataset(h5_path=h5_path, meta_path=meta_path, preprocessing=pre,
                   node_type_index=6, edge_headroom=2.0)

    early, late = ds[0], ds[9]
    for g, deformed in ((early, False), (late, True)):
        n = int(g.node_mask.sum())
        nt = g.x[:n, 6]
        delta = g.y[:n] - g.x[:n, 0:3]
        # bottom face never moves
        assert np.abs(delta[nt == float(NodeType.HANDLE)]).max() == 0.0
        # punch always descends
        assert np.abs(delta[nt == float(NodeType.OBSTACLE)]).max() > 0
        moved = np.abs(delta[nt == float(NodeType.NORMAL)]).max() > 0
        assert moved == deformed
    # punch <-> plate world edges exist near contact
    g = late
    n = int(g.node_mask.sum()); nt = g.x[:n, 6]
    e = int(g.edge_mask.sum())
    s, r = g.senders[:e], g.receivers[:e]
    cross = ((nt[s] == float(NodeType.OBSTACLE)) & (nt[r] == float(NodeType.NORMAL))) | (
        (nt[r] == float(NodeType.OBSTACLE)) & (nt[s] == float(NodeType.NORMAL)))
    assert int(cross.sum()) > 0


def test_panels_xdmf_schema_and_layout(tmp_path):
    """Panels family (reference ``dataset_config/panels_meta.json`` +
    ``training_config/panels.json``): node types come as the STATIC
    ``NodeTypeCoarse`` data field — x layout [Vitesse(3), node_type(1),
    time(1)] puts them at ``node_type_index: 3`` with no external hook."""
    from graphphysics_tpu.dataset.preprocessing import build_preprocessing

    folder, meta_path = write_panels_xdmf(
        str(tmp_path / "train"), num_traj=2, steps=5, nx=8, ny=6
    )
    ds = XDMFDataset(
        xdmf_folder=folder, meta_path=meta_path,
        preprocessing=build_preprocessing(add_edges_features=False),
        add_edge_features=False, node_type_index=3,
    )
    assert ds.size_dataset == 2
    g = ds[0]
    n = int(g.node_mask.sum())
    assert n == 48  # 8x6 grid
    assert g.x.shape[1] == 5
    assert g.edge_attr is None
    nt = g.x[:n, 3]
    # borders + interior panel obstruction present
    for t in (NodeType.NORMAL, NodeType.INFLOW, NodeType.OUTFLOW,
              NodeType.WALL_BOUNDARY):
        assert (nt == float(t)).any(), t
    # velocity zeroed on walls, time column constant
    wall = nt == float(NodeType.WALL_BOUNDARY)
    assert np.allclose(g.x[:n][wall][:, 0:3], 0.0)
    assert np.allclose(g.x[:n, 4], g.x[0, 4])
    # target = next-frame Vitesse
    assert g.y.shape[1] == 3


def test_h5_scan_node_counts_layouts(tmp_path):
    """scan_node_counts across the meta-schema layouts frame_to_sample
    supports: per-frame [T, N, d], static [N, d] without a time axis, and
    flat storage of either (with -1 dims in the meta shape)."""
    import h5py
    import json

    from graphphysics_tpu.dataset.h5_dataset import H5Dataset

    steps, d = 5, 2
    ns = [30, 44]

    def write(name, meta_shape, store):
        p = str(tmp_path / f"{name}.h5")
        with h5py.File(p, "w") as f:
            for tr, n in enumerate(ns):
                g = f.create_group(str(tr))
                pos = np.arange(n * d, dtype=np.float32).reshape(n, d)
                g["mesh_pos"] = store(pos)
                g["cells"] = np.zeros((1, 3), np.int32)
                g["velocity"] = np.zeros((steps, n, d), np.float32)
        mp = str(tmp_path / f"{name}_meta.json")
        with open(mp, "w") as fp:
            json.dump({
                "dt": 0.01, "trajectory_length": steps,
                "features": {
                    "mesh_pos": {"type": "static", "shape": meta_shape,
                                 "dtype": "float32"},
                    "cells": {"type": "static", "shape": [-1, 3],
                              "dtype": "int32"},
                    "velocity": {"type": "dynamic", "shape": [steps, -1, d],
                                 "dtype": "float32"},
                },
                "field_names": ["velocity"],
            }, fp)
        return p, mp

    # static [N, d] stored with its own rank
    p, mp = write("static2d", [-1, d], lambda pos: pos)
    assert H5Dataset(h5_path=p, meta_path=mp).scan_node_counts() == ns
    # static stored FLAT [N*d]
    p, mp = write("staticflat", [-1, d], lambda pos: pos.ravel())
    assert H5Dataset(h5_path=p, meta_path=mp).scan_node_counts() == ns
    # per-frame [T, N, d] stored with its own rank
    p, mp = write("dyn3d", [steps, -1, d],
                  lambda pos: np.repeat(pos[None], steps, axis=0))
    assert H5Dataset(h5_path=p, meta_path=mp).scan_node_counts() == ns
    # per-frame stored flat [T*N, d] with an inferred (-1) time axis
    p, mp = write("dynflat", [-1, -1, d],
                  lambda pos: np.repeat(pos[None], steps, 0).reshape(-1, d))
    assert H5Dataset(h5_path=p, meta_path=mp).scan_node_counts() == ns


def test_xdmf_dt_features_appended(aneurysm):
    """dt_features=True (the reference's xdmf_dataset.py:158 TODO): target/
    previous horizon dts appended as trailing node-feature columns, leaving
    every existing positional index intact."""
    folder, meta_path = aneurysm
    from graphphysics_tpu.dataset.xdmf_dataset import XDMFDataset

    base = XDMFDataset(xdmf_folder=folder, meta_path=meta_path,
                       use_previous_data=True)
    with_dt = XDMFDataset(xdmf_folder=folder, meta_path=meta_path,
                          use_previous_data=True, dt_features=True,
                          random_next=2)
    g0, g1 = base[1], with_dt[1]
    assert g1.x.shape[1] == g0.x.shape[1] + 2
    # leading columns identical (positional indices unaffected)
    np.testing.assert_array_equal(g1.x[:, : g0.x.shape[1]], g0.x)
    dt = with_dt.dt
    real = g1.node_mask
    tdt = g1.x[real, -2]
    pdt = g1.x[real, -1]
    assert np.all(tdt == tdt[0]) and tdt[0] in (dt, 2 * dt)
    assert np.all(pdt == -dt)


def test_canonical_sample_reused_and_released(tmp_path):
    """Startup must not build item 0 twice (the triggering item IS the
    canonical sample), and the cached RawSample must be released once every
    lazy budget has materialized — it pins tens of MB at large-mesh scale
    and is pickled into every spawned worker."""
    from tests.fixtures import write_cylinder_h5
    from graphphysics_tpu.dataset.h5_dataset import H5Dataset

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1,
                                           steps=4, nx=8, ny=6)
    ds = H5Dataset(h5_path=h5_path, meta_path=meta_path)
    loads = {"n": 0}
    orig = ds._load

    def counting_load(index):
        loads["n"] += 1
        return orig(index)

    ds._load = counting_load
    ds[0]
    assert loads["n"] == 1  # no duplicate canonical build
    assert ds._canonical_sample_cache is None  # released after budgets
    assert ds.node_budget is not None and ds.edge_budget is not None


def test_canonical_sample_pins_epoch(aneurysm):
    """The canonical sample is 'item 0 as at epoch 0' even when budgets
    materialize mid-training: XDMF multi-dt offsets draw from the dataset's
    CURRENT epoch inside _load, so the builder must pin it."""
    from graphphysics_tpu.dataset.xdmf_dataset import XDMFDataset

    folder, meta_path = aneurysm
    ds0 = XDMFDataset(xdmf_folder=folder, meta_path=meta_path, random_next=3)
    canon0 = ds0._canonical_sample()
    ds5 = XDMFDataset(xdmf_folder=folder, meta_path=meta_path, random_next=3)
    ds5.set_epoch(5)
    canon5 = ds5._canonical_sample()
    assert ds5._epoch == 5  # epoch restored after the pinned build
    np.testing.assert_array_equal(canon0.x, canon5.x)
    assert canon0.target_dt == canon5.target_dt


class _BoomDataset:
    """Module-level: spawn pickles the dataset into workers."""

    def __getitem__(self, i):
        if i == 1:
            raise ValueError("boom at 1")
        return np.zeros(3)


class _SlowDataset:
    def __getitem__(self, i):
        import time

        time.sleep(0.2)
        return i


def test_spawn_pool_propagates_worker_exception():
    """An exception inside a worker's __getitem__ must surface in the
    parent (not hang the epoch): the pool relays the exception object."""
    from graphphysics_tpu.dataset.loader import _SpawnWorkerPool

    pool = _SpawnWorkerPool(_BoomDataset(), num_workers=2)
    with pool:
        t0 = pool.submit(0)
        t1 = pool.submit(1)
        np.testing.assert_array_equal(t0.result(), np.zeros(3))
        with pytest.raises(ValueError, match="boom at 1"):
            t1.result()


def test_spawn_pool_shutdown_cancels_pending():
    """shutdown(cancel_futures=True) drains queued tasks and joins workers
    (the producer-thread abandon path must release the pool promptly)."""
    import time

    from graphphysics_tpu.dataset.loader import _SpawnWorkerPool

    pool = _SpawnWorkerPool(_SlowDataset(), num_workers=1)
    first = pool.submit(0)
    for i in range(20):
        pool.submit(i + 1)
    assert first.result() == 0
    t0 = time.time()
    pool.shutdown(wait=True, cancel_futures=True)
    assert time.time() - t0 < 15  # not 20 x 0.2s of queued work
    assert all(not p.is_alive() for p in pool._procs)


def test_multiworker_pool_persists_and_tracks_epochs(cylinder):
    """The spawn pool must persist across epochs (startup is ~seconds) AND
    its workers must follow set_epoch — per-epoch noise draws in worker
    batches must equal the in-process loader's for every epoch."""
    h5_path, meta_path = cylinder
    ds_ref = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(0.1),
        node_type_index=2,
    )
    ref_loader = GraphLoader(ds_ref, batch_size=4, shuffle=True, seed=3,
                             prefetch=0)
    ds_w = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(0.1),
        node_type_index=2,
    )
    ds_w.node_budget, ds_w.edge_budget = ds_ref.node_budget, ds_ref.edge_budget
    w_loader = GraphLoader(ds_w, batch_size=4, shuffle=True, seed=3,
                           prefetch=1, num_workers=2)
    try:
        for epoch in (0, 1, 2):
            ref_loader.set_epoch(epoch)
            w_loader.set_epoch(epoch)
            ref_batches = list(ref_loader)
            w_batches = list(w_loader)
            assert len(ref_batches) == len(w_batches)
            for a, b in zip(ref_batches, w_batches):
                np.testing.assert_array_equal(a.x, b.x)
            if epoch == 0:
                pool0 = w_loader._pool
                assert pool0 is not None
            else:
                assert w_loader._pool is pool0  # persisted, not rebuilt
    finally:
        w_loader.close()
    assert w_loader._pool is None


def test_multiworker_abandoned_epoch_keeps_pool_alive(cylinder):
    """Breaking out of a multi-worker epoch mid-way must cancel pending work
    but keep the workers for the next epoch, which must still be correct."""
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    loader = GraphLoader(ds, batch_size=2, shuffle=True, seed=1, prefetch=2,
                         num_workers=2)
    try:
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch
        full = list(loader)  # same pool, fresh epoch pass
        ref = list(GraphLoader(ds, batch_size=2, shuffle=True, seed=1,
                               prefetch=0))
        assert len(full) == len(ref)
        for a, b in zip(full, ref):
            np.testing.assert_array_equal(a.x, b.x)
    finally:
        loader.close()


def test_spawn_pool_detects_dead_worker():
    """A worker killed mid-task (OOM-killer analog) must fail the waiting
    result() promptly with a diagnostic, not hang the epoch forever."""
    import time

    from graphphysics_tpu.dataset.loader import _SpawnWorkerPool

    pool = _SpawnWorkerPool(_SlowDataset(), num_workers=1)
    try:
        t = pool.submit(0)
        assert t.result() == 0  # worker is up and serving
        t2 = pool.submit(1)
        time.sleep(0.05)  # let the worker pick the task up
        pool._procs[0].terminate()
        t0 = time.time()
        with pytest.raises(RuntimeError, match="died unexpectedly"):
            t2.result()
        assert time.time() - t0 < 10
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def test_multiworker_interleaved_iterators_share_pool(cylinder):
    """Two interleaved iterators over one multi-worker loader must not
    cancel each other's work (generation-tagged submissions on the shared
    persistent pool)."""
    h5_path, meta_path = cylinder
    ds = H5Dataset(
        h5_path=h5_path, meta_path=meta_path, preprocessing=_cyl_preproc(),
        node_type_index=2,
    )
    loader = GraphLoader(ds, batch_size=2, shuffle=True, seed=2, prefetch=2,
                         num_workers=2)
    ref = list(GraphLoader(ds, batch_size=2, shuffle=True, seed=2,
                           prefetch=0))
    try:
        it_a = iter(loader)
        first_a = next(it_a)
        it_b = iter(loader)   # second iterator while A is mid-epoch
        first_b = next(it_b)
        it_b.close()          # B abandons: must not cancel A's pending work
        rest_a = list(it_a)
        got = [first_a] + rest_a
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(np.asarray(first_b.x),
                                      np.asarray(ref[0].x))
    finally:
        loader.close()


def test_multihost_loader_workers_match_inline(cylinder):
    """MultihostGraphLoader(num_workers=2) must yield the same global
    batches as the inline build (single-process degenerate case)."""
    import jax
    from jax.sharding import Mesh

    from graphphysics_tpu.parallel.multihost import MultihostGraphLoader

    h5_path, meta_path = cylinder
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    def make(workers):
        ds = H5Dataset(
            h5_path=h5_path, meta_path=meta_path,
            preprocessing=_cyl_preproc(0.1), node_type_index=2,
        )
        return MultihostGraphLoader(ds, per_host_batch=4, mesh=mesh,
                                    shuffle=True, seed=9,
                                    num_workers=workers)
    inline = make(0)
    pooled = make(2)
    # NO budget alignment: lazy budgets are canonical (derived from item 0),
    # so worker-derived shapes must already match the inline build's —
    # pre-aligning would mask a cross-process divergence
    try:
        for epoch in (0, 1):
            inline.set_epoch(epoch)
            pooled.set_epoch(epoch)
            a_batches = list(inline)
            b_batches = list(pooled)
            assert len(a_batches) == len(b_batches) > 0
            for a, b in zip(a_batches, b_batches):
                np.testing.assert_array_equal(np.asarray(a.x),
                                              np.asarray(b.x))
    finally:
        pooled.close()


class _EchoDataset:
    def __getitem__(self, i):
        return np.full(4, i)


def test_spawn_pool_concurrent_submitters_stress():
    """Two threads hammering submit/result on one pool (the concurrent-
    iterator shape): every waiter must get ITS OWN item back — lock-guarded
    tid allocation and result bookkeeping."""
    import threading

    from graphphysics_tpu.dataset.loader import _SpawnWorkerPool

    pool = _SpawnWorkerPool(_EchoDataset(), num_workers=2)
    errors = []

    def hammer(base):
        try:
            gen = pool.begin_epoch()
            for start in range(0, 200, 10):
                tasks = [
                    (i, pool.submit(base + i, 0, gen))
                    for i in range(start, start + 10)
                ]
                for i, t in tasks:
                    np.testing.assert_array_equal(
                        t.result(), np.full(4, base + i)
                    )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=hammer, args=(b,)) for b in (0, 10_000)
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not any(t.is_alive() for t in threads), "stress hung"
        assert not errors, errors
    finally:
        pool.shutdown(wait=True, cancel_futures=True)


def test_xdmf_missing_dynamic_feature_raises():
    """A physics field listed in meta but absent from a grid's point data
    would silently shift every later x column — it must fail at the cause.
    Structural entries (cells/mesh_pos ride in the grid topology) still
    skip."""
    from graphphysics_tpu.dataset.xdmf_dataset import XDMFDataset

    ds = XDMFDataset.__new__(XDMFDataset)
    ds.meta = {
        "features": {
            "Vitesse": {"type": "dynamic", "dtype": "float32"},
            "cells": {"type": "static", "dtype": "int32"},
        }
    }
    out = ds._filter_features({"Vitesse": np.zeros((4, 2))})
    assert list(out) == ["Vitesse"]  # absent structural 'cells' skips
    with pytest.raises(KeyError, match="Vitesse"):
        ds._filter_features({"somethingelse": np.zeros(4)})


def test_h5_untiled_static_and_inferred_time_layouts_load(tmp_path):
    """The layouts scan_node_counts blesses must also LOAD: a meta with an
    inferred (-1) time axis resolves it from trajectory_length (numpy
    reshape takes one unknown), and static fields stored WITHOUT the time
    axis ([N, k]) — node_type included — are used as-is per frame."""
    import h5py

    from graphphysics_tpu.dataset.h5_dataset import H5Dataset

    steps, d, n = 5, 2, 30
    p = str(tmp_path / "untiled.h5")
    node_type = np.zeros((n, 1), np.int32)
    node_type[::3] = 1
    with h5py.File(p, "w") as f:
        g = f.create_group("0")
        g["mesh_pos"] = np.arange(n * d, dtype=np.float32).reshape(n, d)
        g["cells"] = np.stack(
            [np.arange(n - 2), np.arange(1, n - 1), np.arange(2, n)], 1
        ).astype(np.int32)
        g["node_type"] = node_type
        # dynamic velocity stored FLAT with a [-1, -1, d] meta shape
        vel = np.arange(steps * n * d, dtype=np.float32).reshape(steps, n, d)
        g["velocity"] = vel.ravel()
    import json

    mp = str(tmp_path / "untiled_meta.json")
    with open(mp, "w") as fp:
        json.dump({
            "dt": 0.01, "trajectory_length": steps,
            "features": {
                "mesh_pos": {"type": "static", "shape": [-1, d],
                             "dtype": "float32"},
                "cells": {"type": "static", "shape": [-1, 3],
                          "dtype": "int32"},
                "node_type": {"type": "static", "shape": [-1, 1],
                              "dtype": "int32"},
                "velocity": {"type": "dynamic", "shape": [-1, -1, d],
                             "dtype": "float32"},
            },
            "field_names": ["velocity"],
        }, fp)
    ds = H5Dataset(h5_path=p, meta_path=mp)
    s = ds[1]  # frame 1 of trajectory 0 (padded to the static node budget)
    x = np.asarray(s.x)[:n]
    # node_type column is node_type (NOT node 1's row broadcast), and the
    # dynamic field is frame 1 of the reshaped flat storage
    vel1 = np.arange(steps * n * d, dtype=np.float32).reshape(steps, n, d)[1]
    np.testing.assert_array_equal(x[:, :d], vel1)
    np.testing.assert_array_equal(x[:, d], node_type[:, 0])


def test_switch_to_val_replaces_last_train_occurrence(tmp_path):
    """'constrained_runs/train.h5' must become 'constrained_runs/test.h5',
    not 'constested_runs/...' (replace-all corrupted any path with 'train'
    inside an unrelated component)."""
    import h5py

    from graphphysics_tpu.dataset.h5_dataset import H5Dataset

    d = tmp_path / "constrained_runs"
    d.mkdir()
    for name in ("train.h5", "test.h5"):
        with h5py.File(str(d / name), "w") as f:
            g = f.create_group("0")
            g["mesh_pos"] = np.zeros((4, 2), np.float32)
            g["cells"] = np.zeros((1, 3), np.int32)
            g["velocity"] = np.zeros((3, 4, 2), np.float32)
    import json

    mp = str(tmp_path / "m.json")
    with open(mp, "w") as fp:
        json.dump({
            "dt": 0.01, "trajectory_length": 3,
            "features": {
                "mesh_pos": {"type": "static", "shape": [-1, 2],
                             "dtype": "float32"},
                "cells": {"type": "static", "shape": [-1, 3],
                          "dtype": "int32"},
                "velocity": {"type": "dynamic", "shape": [3, -1, 2],
                             "dtype": "float32"},
            },
            "field_names": ["velocity"],
        }, fp)
    ds = H5Dataset(h5_path=str(d / "train.h5"), meta_path=mp,
                   switch_to_val=True)
    assert ds.h5_path == str(d / "test.h5")


def test_add_obstacles_next_pos_preserves_prefix_columns():
    """world_pos not at column 0: columns before it must survive, and
    node_type must be read from the right pre-insertion column."""
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.dataset.preprocessing import add_obstacles_next_pos
    from graphphysics_tpu.dataset.sample import RawSample

    n = 6
    rng = np.random.default_rng(0)
    vel = rng.normal(size=(n, 2)).astype(np.float32)
    wp = rng.normal(size=(n, 3)).astype(np.float32)
    nt = np.zeros((n, 1), np.float32)
    nt[:2] = NodeType.OBSTACLE
    # layout: [vel(2), world_pos(3), node_type] ; post-insertion nti = 2+3+3
    x = np.concatenate([vel, wp, nt], axis=1)
    y = rng.normal(size=(n, 5)).astype(np.float32)
    s = RawSample(x=x.copy(), pos=np.zeros((n, 2), np.float32),
                  faces=np.zeros((1, 3), np.int64), y=y.copy())
    out = add_obstacles_next_pos(
        s, rng, world_pos_index_start=2, world_pos_index_end=5,
        node_type_index=8,
    )
    assert out.x.shape[1] == 9
    np.testing.assert_array_equal(out.x[:, :2], vel)      # prefix intact
    np.testing.assert_array_equal(out.x[:, 2:5], wp)
    np.testing.assert_array_equal(out.x[:, 8], nt[:, 0])  # node_type intact
    disp = out.x[:, 5:8]
    np.testing.assert_allclose(disp[:2], y[:2, 2:5] - wp[:2], rtol=1e-6)
    # non-obstacle rows carry the obstacle-mean displacement
    np.testing.assert_allclose(
        disp[2:], np.broadcast_to((y[:2, 2:5] - wp[:2]).mean(0), (n - 2, 3)),
        rtol=1e-5,
    )
