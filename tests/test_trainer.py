"""End-to-end training tests on the generated cylinder fixture (the analog of
the reference's Lightning-module tests + CI train-predict pipeline)."""

import json
import os
import shutil

import numpy as np
import pytest

from graphphysics_tpu.dataset import GraphLoader
from graphphysics_tpu.training.parse_parameters import (
    get_dataset,
    get_preprocessing,
    get_simulator,
)
from graphphysics_tpu.training.trainer import Trainer
from tests.fixtures import write_cylinder_h5


@pytest.fixture(scope="module")
def cylinder_env(tmp_path_factory):
    # NB: the dir name must not contain "train" — switch_to_val does a
    # whole-path "train"->"test" replace (reference h5_dataset.py:40-41)
    d = tmp_path_factory.mktemp("cyl_fit")
    h5_path, meta_path = write_cylinder_h5(str(d), num_traj=2, steps=8, nx=8, ny=6)
    shutil.copy(h5_path, str(d / "test.h5"))
    param = {
        "dataset": {
            "extension": "h5",
            "h5_path": h5_path,
            "meta_path": meta_path,
            "khop": 1,
        },
        "model": {
            "type": "epd",
            "message_passing_num": 2,
            "hidden_size": 16,
            "node_input_size": 2,
            "output_size": 2,
            "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 2,
            "output_index_start": 0,
            "output_index_end": 2,
            "node_type_index": 2,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.02,
                "noise_index_start": [0],
                "noise_index_end": [2],
                "masking": 0,
            },
            "world_pos_parameters": {"use": False},
        },
    }
    return d, param


def _make(param, tmp, **kw):
    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(param, val_pre, switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param,
        learning_rate=1e-3,
        warmup=5,
        checkpoint_dir=str(tmp / "ckpt"),
        metrics_path=str(tmp / "metrics.csv"),
        rollout_dir=str(tmp / "meshes"),
        log_every=5,
        **kw,
    )
    return trainer, loader, val_ds


def test_fit_decreases_loss_and_validates(cylinder_env):
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=3)
    assert len(history["train_loss"]) == 3
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert all(np.isfinite(v) for v in history["val_rmse"])
    # artifacts
    assert os.path.exists(tmp / "ckpt" / "state.msgpack")
    assert os.path.exists(tmp / "metrics.csv")
    ep0 = tmp / "meshes" / "epoch_0"
    assert any(str(f).endswith(".xdmf") for f in os.listdir(ep0))


def test_checkpoint_resume_roundtrip(cylinder_env):
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    trainer.fit(loader, num_epochs=1)
    ckpt = str(tmp / "ckpt" / "state.msgpack")
    step_before = int(trainer.state["step"])
    norm_before = np.asarray(
        trainer.state["normalizer"]["node_normalizer"]["state"].acc_sum
    )

    trainer2, loader2, _ = _make(param, tmp)
    trainer2.init_state(next(iter(loader2)), num_steps=10)
    from graphphysics_tpu.training.checkpoint import load_checkpoint, load_metadata

    trainer2.state = load_checkpoint(ckpt, trainer2.state)
    assert int(trainer2.state["step"]) == step_before
    np.testing.assert_allclose(
        np.asarray(trainer2.state["normalizer"]["node_normalizer"]["state"].acc_sum),
        norm_before,
    )
    assert load_metadata(ckpt)["epoch"] == 1


def test_predict_writes_xdmf(cylinder_env, tmp_path):
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    trainer.fit(loader, num_epochs=1)
    out = trainer.predict(val_ds, save_dir=str(tmp_path / "predictions"))
    assert len(out) == val_ds.size_dataset
    files = os.listdir(tmp_path / "predictions")
    assert sum(f.endswith(".xdmf") for f in files) == val_ds.size_dataset
    # read back one prediction file through the first-party reader
    from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesReader

    fn = [f for f in files if f.endswith(".xdmf")][0]
    with XdmfTimeSeriesReader(str(tmp_path / "predictions" / fn)) as r:
        assert r.num_steps == val_ds.trajectory_length - 1
        _, pd, _ = r.read_data(0)
        assert "prediction" in pd


def test_val_trajectory_cache_is_per_dataset(cylinder_env):
    """validate(val_ds) then predict(test_ds) must not serve the first
    dataset's cached trajectories for the second."""
    tmp, param = cylinder_env
    val_pre = get_preprocessing(param, remove_noise=True)
    ds1 = get_dataset(param, val_pre, switch_to_val=True)
    ds2 = get_dataset(param, val_pre, switch_to_val=True)
    trainer = Trainer(param)
    g1 = trainer._stacked_trajectory(ds1, 0)
    assert trainer._stacked_trajectory(ds1, 0) is g1  # cache hit, same ds
    g2 = trainer._stacked_trajectory(ds2, 0)
    assert g2 is not g1  # fresh dataset -> cache rebuilt


def test_cli_train_smoke(cylinder_env, tmp_path, monkeypatch):
    tmp, param = cylinder_env
    cfg_path = tmp_path / "cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(param, f)
    monkeypatch.chdir(tmp_path)
    from graphphysics_tpu.cli.train import main

    rc = main(
        [
            "--training_parameters_path", str(cfg_path),
            "--num_epochs", "1",
            "--batch_size", "2",
            "--warmup", "2",
            "--val_trajectories", "1",
        ]
    )
    assert rc == 0
    assert os.path.exists(tmp_path / "checkpoints" / "state.msgpack")


def test_fit_data_parallel_on_mesh(cylinder_env):
    """Data-parallel Trainer over the virtual 8-device mesh must train and
    validate like the single-device path."""
    tmp, param = cylinder_env
    import jax

    assert len(jax.devices()) == 8
    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(param, val_pre, switch_to_val=True)
    loader = GraphLoader(
        train_ds, batch_size=8, shuffle=True, prefetch=0, collate="stack"
    )
    trainer = Trainer(
        param,
        learning_rate=1e-3,
        warmup=2,
        data_parallel=True,
        checkpoint_dir=str(tmp / "ckpt_dp"),
        metrics_path=None,
        rollout_dir=None,
        log_every=5,
    )
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=2)
    assert len(history["train_loss"]) == 2
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert all(np.isfinite(v) for v in history["val_rmse"])


def test_fit_graph_partition_matches_single_device(cylinder_env):
    """Trainer(graph_partition=4): every concat batch splits into 4 node
    blocks over a (graph,) mesh with per-layer halo exchange — losses must
    match the plain single-device trainer on the same batch stream."""
    tmp, param = cylinder_env

    def history_for(**kw):
        train_pre = get_preprocessing(param)
        val_pre = get_preprocessing(param, remove_noise=True)
        train_ds = get_dataset(param, train_pre)
        val_ds = get_dataset(param, val_pre, switch_to_val=True)
        loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
        trainer = Trainer(
            param, learning_rate=1e-3, warmup=2,
            checkpoint_dir=str(tmp / "ckpt_gp"), metrics_path=None,
            rollout_dir=None, log_every=5, **kw,
        )
        return trainer.fit(loader, val_dataset=val_ds, num_epochs=2), trainer

    ref_hist, _ = history_for()
    for mode in ("halo", "gather"):
        hist, trainer = history_for(graph_partition=4, partition_mode=mode)
        assert trainer.mesh.axis_names == ("graph",)
        assert len(trainer._part_budgets) == 1  # one budget pair per batch shape
        np.testing.assert_allclose(
            hist["train_loss"], ref_hist["train_loss"], rtol=5e-3,
            err_msg=mode,
        )
        assert all(np.isfinite(v) for v in hist["val_rmse"])


def test_partitioned_validation_matches_unpartitioned(cylinder_env):
    """partitioned_validation=True rolls each trajectory out edge-partitioned
    over the graph mesh — RMSE must match the unpartitioned rollout."""
    tmp, param = cylinder_env
    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(param, val_pre, switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=2, graph_partition=4,
        partitioned_validation=True,
        checkpoint_dir=str(tmp / "ckpt_pv"), metrics_path=None,
        rollout_dir=None, log_every=5,
    )
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=1)
    rmse_part = history["val_rmse"][0]
    trainer.partitioned_validation = False
    rmse_plain = trainer.validate(val_ds, epoch=0, save_rollout=False)
    np.testing.assert_allclose(rmse_part, rmse_plain, rtol=1e-4)


def test_partitioned_predict_matches_unpartitioned(cylinder_env, tmp_path):
    """Trainer.predict with partitioned rollouts writes the same predictions
    as the plain path (grph-predict --graph_partition)."""
    tmp, param = cylinder_env
    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(param, val_pre, switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=2, graph_partition=4,
        partitioned_validation=True, parallel_validation=False,
        checkpoint_dir=str(tmp / "ckpt_pp_pred"), metrics_path=None,
        rollout_dir=None, log_every=5,
    )
    trainer.fit(loader, num_epochs=1)
    out_part = trainer.predict(val_ds, save_dir=str(tmp_path / "p_part"))
    trainer.partitioned_validation = False
    out_plain = trainer.predict(val_ds, save_dir=str(tmp_path / "p_plain"))
    assert len(out_part) == len(out_plain) == val_ds.size_dataset
    for a, b in zip(out_part, out_plain):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_graph_partition_accepts_csr_batches(cylinder_env):
    """CSR-layout batches COMPOSE with partitioning (round 3): the trainer
    re-derives per-part receiver-sorted bounds + a canonical static chunk
    budget, so the fused Pallas attention runs inside the partitioned step
    (full numeric parity: tests/test_graph_partition.py test_partitioned_csr_*)."""
    from graphphysics_tpu.core.graph import pad_graph_csr_np

    _, param = cylinder_env
    trainer = Trainer(
        param, graph_partition=2, metrics_path=None, rollout_dir=None,
    )
    r = np.random.default_rng(0)
    n, e = 256, 512
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = 0
    g = pad_graph_csr_np(
        x, r.normal(size=(n, 2)).astype(np.float32),
        r.integers(0, n, e).astype(np.int32),
        r.integers(0, n, e).astype(np.int32),
        n_pad=n, e_pad=e, edge_attr=r.normal(size=(e, 3)).astype(np.float32),
        y=r.normal(size=(n, 2)).astype(np.float32), node_type_index=2,
    )
    parts = trainer._partition_graph(g)
    assert parts.csr_bounds is not None
    assert parts.csr_bounds.shape[0] == 2  # stacked per part
    assert parts.csr_max_chunks >= 1
    # per-part real edges are receiver-sorted (the partitioned softmax key)
    for p in range(2):
        m = np.asarray(parts.edge_mask[p])
        rloc = np.asarray(parts.receivers[p])[m]
        assert np.all(np.diff(rloc) >= 0)
    # identical static budgets for every batch of this shape (compile cache)
    parts2 = trainer._partition_graph(g)
    assert parts2.senders.shape == parts.senders.shape
    assert parts2.csr_max_chunks == parts.csr_max_chunks


def test_fit_dp_graph_partition_2d(cylinder_env):
    """Trainer(data_parallel + graph_partition=2): the 2-D (data x graph)
    step from the stacked loader batch."""
    tmp, param = cylinder_env
    train_pre = get_preprocessing(param)
    train_ds = get_dataset(param, train_pre)
    loader = GraphLoader(
        train_ds, batch_size=4, shuffle=True, prefetch=0, collate="stack"
    )
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=2, data_parallel=True,
        graph_partition=2, num_devices=8,
        checkpoint_dir=str(tmp / "ckpt_gp2d"), metrics_path=None,
        rollout_dir=None, log_every=5,
    )
    history = trainer.fit(loader, num_epochs=2)
    assert trainer.mesh.devices.shape == (4, 2)
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    assert history["train_loss"][-1] < history["train_loss"][0]


class _SignalAfter:
    """Loader wrapper: raises SIGTERM in-process just before yielding batch
    ``after-1`` — the trainer consumes that batch, then its signal handler
    requests a checkpoint-and-stop (simulated preemption)."""

    def __init__(self, loader, after):
        self.loader, self.after = loader, after

    def __len__(self):
        return len(self.loader)

    def peek(self):
        return self.loader.peek()

    def set_epoch(self, epoch):
        self.loader.set_epoch(epoch)

    def set_start_batch(self, b):
        self.loader.set_start_batch(b)

    def __iter__(self):
        import signal

        for i, item in enumerate(self.loader):
            if i == self.after - 1:
                os.kill(os.getpid(), signal.SIGTERM)
            yield item


def test_preemption_mid_epoch_resume_exact(cylinder_env, tmp_path):
    """SIGTERM mid-epoch checkpoints; resuming continues the deterministic
    batch stream so the final state is bit-identical to an uninterrupted run."""
    from graphphysics_tpu.training.checkpoint import load_metadata

    tmp, param = cylinder_env

    # reference run: 2 uninterrupted epochs
    trainer_a, loader_a, _ = _make(param, tmp_path / "a")
    trainer_a.fit(loader_a, num_epochs=2)
    params_a = jax_leaves(trainer_a.state["params"])

    # preempted run: SIGTERM lands during epoch 0 after 2 batches
    trainer_b, loader_b, _ = _make(param, tmp_path / "b")
    history = trainer_b.fit(_SignalAfter(loader_b, after=2), num_epochs=2)
    assert history["interrupted"]
    ckpt = str(tmp_path / "b" / "ckpt" / "state.msgpack")
    meta = load_metadata(ckpt)
    assert meta["epoch"] == 0 and meta["batch_offset"] == 2

    # resume: picks up at epoch 0 batch 2, finishes both epochs
    trainer_c, loader_c, _ = _make(param, tmp_path / "b")
    history_c = trainer_c.fit(loader_c, num_epochs=2, resume_from=ckpt)
    assert not history_c["interrupted"]
    assert int(trainer_c.state["step"]) == int(trainer_a.state["step"])
    for pa, pc in zip(params_a, jax_leaves(trainer_c.state["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))


def test_save_every_n_steps_writes_mid_epoch_metadata(cylinder_env, tmp_path):
    tmp, param = cylinder_env
    from graphphysics_tpu.training.checkpoint import load_metadata

    trainer, loader, _ = _make(param, tmp_path / "p")
    trainer.save_every_n_steps = 1
    seen = []
    orig = trainer.save

    def spy(epoch, batch_offset=None):
        orig(epoch, batch_offset=batch_offset)
        seen.append((epoch, batch_offset))

    trainer.save = spy
    trainer.fit(loader, num_epochs=1)
    # every step saved with its batch offset, then the end-of-epoch save
    assert seen[:-1] == [(0, k + 1) for k in range(len(loader))]
    assert seen[-1] == (0, None)
    assert load_metadata(str(tmp_path / "p" / "ckpt" / "state.msgpack"))["epoch"] == 1


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_profile_dir_writes_trace(cylinder_env, tmp_path):
    tmp, param = cylinder_env
    trainer, loader, _ = _make(param, tmp_path / "prof")
    trainer.profile_dir = str(tmp_path / "trace")
    trainer.profile_start_step = 2
    trainer.profile_num_steps = 2
    trainer.fit(loader, num_epochs=1)
    assert not trainer._trace_active
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(tmp_path / "trace")
        for f in fs
    ]
    assert found, "no profiler trace files written"


def test_fit_gmm_head(cylinder_env):
    """Training with a diagonal GMM head: NLL loss path + sampled rollout."""
    tmp, param = cylinder_env
    param_gmm = json.loads(json.dumps(param))
    param_gmm["model"]["num_mixture_components"] = 2
    param_gmm["model"]["temperature"] = 1.0
    train_pre = get_preprocessing(param_gmm)
    val_pre = get_preprocessing(param_gmm, remove_noise=True)
    train_ds = get_dataset(param_gmm, train_pre)
    val_ds = get_dataset(param_gmm, val_pre, switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param_gmm, learning_rate=1e-3, warmup=2,
        checkpoint_dir=str(tmp / "ckpt_gmm"), metrics_path=None,
        rollout_dir=None, log_every=5,
    )
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=1)
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_rmse"][0])


def test_fit_full_cov_gmm_head(cylinder_env):
    """TPU extension: "use_diagonal": false trains a FULL-covariance GMM
    head with the full NLL (the reference implements both heads/losses but
    only wires the diagonal) — loss path + Cholesky-sampled rollout."""
    tmp, param = cylinder_env
    param_gmm = json.loads(json.dumps(param))
    param_gmm["model"]["num_mixture_components"] = 2
    param_gmm["model"]["temperature"] = 1.0
    param_gmm["model"]["use_diagonal"] = False
    train_pre = get_preprocessing(param_gmm)
    val_pre = get_preprocessing(param_gmm, remove_noise=True)
    train_ds = get_dataset(param_gmm, train_pre)
    val_ds = get_dataset(param_gmm, val_pre, switch_to_val=True)
    loader = GraphLoader(train_ds, batch_size=2, shuffle=True, prefetch=0)
    trainer = Trainer(
        param_gmm, learning_rate=1e-3, warmup=2,
        checkpoint_dir=str(tmp / "ckpt_gmm_full"), metrics_path=None,
        rollout_dir=None, log_every=5,
    )
    assert trainer.use_diagonal is False
    # head emits per-component 1 + d + d(d+1)/2 params (reference GMMHead,
    # layers.py:137-147)
    d = param_gmm["model"]["output_size"]
    assert trainer.sim.model.K * (1 + d + d * (d + 1) // 2) > 0
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=1)
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_rmse"][0])


@pytest.mark.parametrize("backend", ["orbax", "orbax-async"])
def test_orbax_checkpoint_backend_roundtrip(cylinder_env, tmp_path, backend):
    """Directory-based orbax checkpoints: fit + resume metadata + state
    restore, auto-detected by load_checkpoint."""
    pytest.importorskip("orbax.checkpoint")
    from graphphysics_tpu.training.checkpoint import (
        load_checkpoint,
        load_metadata,
        wait_for_async_saves,
    )

    tmp, param = cylinder_env
    trainer, loader, _ = _make(param, tmp_path / backend)
    trainer.checkpoint_backend = backend
    trainer.checkpoint_name = "state.orbax"
    trainer.fit(loader, num_epochs=1)
    wait_for_async_saves()
    ckpt = str(tmp_path / backend / "ckpt" / "state.orbax")
    assert os.path.isdir(ckpt)
    assert load_metadata(ckpt)["epoch"] == 1

    trainer2, loader2, _ = _make(param, tmp_path / backend)
    trainer2.init_state(loader2.peek(), num_steps=10)
    restored = load_checkpoint(ckpt, trainer2.state)
    assert int(restored["step"]) == int(trainer.state["step"])
    for a, b in zip(jax_leaves(restored["params"]),
                    jax_leaves(trainer.state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_staged_save_never_clobbers_live_checkpoint(cylinder_env, tmp_path):
    """The orbax backends stage into ``path.next`` and swap — a second save
    never rmtree's the live checkpoint before the new one commits, and a
    crash between the two swap renames (live missing, ``.next``/``.old``
    present) still resolves to a complete checkpoint."""
    pytest.importorskip("orbax.checkpoint")
    import shutil

    from graphphysics_tpu.training.checkpoint import (
        load_checkpoint,
        load_metadata,
        save_checkpoint,
    )

    tmp, param = cylinder_env
    trainer, loader, _ = _make(param, tmp_path / "stage")
    trainer.init_state(loader.peek(), num_steps=10)
    ckpt = str(tmp_path / "stage" / "state.orbax")

    save_checkpoint(ckpt, trainer.state, metadata={"epoch": 1}, backend="orbax")
    save_checkpoint(ckpt, trainer.state, metadata={"epoch": 2}, backend="orbax")
    assert os.path.isdir(ckpt)
    assert not os.path.exists(ckpt + ".next")
    assert not os.path.exists(ckpt + ".old")
    assert load_metadata(ckpt)["epoch"] == 2

    # committed-but-unswapped stage (crash before the swap): newest wins
    os.rename(ckpt, ckpt + ".next")
    assert load_metadata(ckpt)["epoch"] == 2
    restored = load_checkpoint(ckpt, trainer.state)
    assert int(restored["step"]) == int(trainer.state["step"])
    os.rename(ckpt + ".next", ckpt)

    # crash between rename(live -> .old) and rename(.next -> live)
    os.rename(ckpt, ckpt + ".old")
    assert load_metadata(ckpt)["epoch"] == 2
    shutil.rmtree(ckpt + ".old")


def test_grph_combined_cli_dispatch(cylinder_env, tmp_path, monkeypatch):
    """``grph train ...`` (and bare flags, reference setup.py:6 drop-in)
    dispatch to the train CLI; ``grph predict`` reaches the predict CLI."""
    tmp, param = cylinder_env
    cfg_path = tmp_path / "cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(param, f)
    monkeypatch.chdir(tmp_path)
    from graphphysics_tpu.cli.__main__ import main

    rc = main([
        "train",
        "--training_parameters_path", str(cfg_path),
        "--num_epochs", "1", "--batch_size", "2", "--warmup", "2",
        "--val_trajectories", "1",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "checkpoints" / "state.msgpack")

    rc = main([
        "predict",
        "--training_parameters_path", str(cfg_path),
        "--model_path", str(tmp_path / "checkpoints" / "state.msgpack"),
        "--save_dir", str(tmp_path / "preds"),
        "--max_trajectories", "1",
    ])
    assert rc == 0
    assert any(f.endswith(".xdmf") for f in os.listdir(tmp_path / "preds"))


def test_validate_logs_val_loss(cylinder_env):
    """The per-step masked L2 "val_loss" on denormalized rollout predictions
    (reference lightning_module.py:225-232) is computed for L2 heads."""
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    trainer.fit(loader, num_epochs=1)
    rmse = trainer.validate(val_ds, save_rollout=False)
    assert np.isfinite(rmse)
    assert trainer.last_val_loss is not None
    assert np.isfinite(trainer.last_val_loss)


def test_parallel_validation_matches_sequential(cylinder_env):
    """Multi-device batched validation rollouts (vmap over trajectories,
    sharded over the data axis) must reproduce the sequential path's
    all-rollout RMSE and val_loss exactly — including the chunk padding
    (2 trajectories over an 8-device mesh)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    trainer.fit(loader, num_epochs=1)

    trainer.parallel_validation = False
    rmse_seq = trainer.validate(val_ds, save_rollout=False)
    vloss_seq = trainer.last_val_loss

    trainer.parallel_validation = True
    rmse_par = trainer.validate(val_ds, save_rollout=False)
    vloss_par = trainer.last_val_loss

    assert trainer._validation_mesh(val_ds.size_dataset) is not None
    assert rmse_par == pytest.approx(rmse_seq, rel=1e-5)
    assert vloss_par == pytest.approx(vloss_seq, rel=1e-5)


def test_parallel_predict_matches_sequential(cylinder_env, tmp_path):
    """predict()'s chunked parallel path must return the same per-trajectory
    prediction arrays (and write the same XDMF files) as the sequential
    path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    tmp, param = cylinder_env
    trainer, loader, val_ds = _make(param, tmp)
    trainer.fit(loader, num_epochs=1)

    trainer.parallel_validation = False
    seq = trainer.predict(val_ds, save_dir=str(tmp_path / "seq"))
    trainer.parallel_validation = True
    par = trainer.predict(val_ds, save_dir=str(tmp_path / "par"))

    assert len(seq) == len(par) == val_ds.size_dataset
    for a, b in zip(seq, par):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert sorted(os.listdir(tmp_path / "seq")) == sorted(
        os.listdir(tmp_path / "par")
    )


def test_parallel_validation_gmm_matches_sequential(cylinder_env):
    """Per-trajectory PRNG keys fold in the trajectory index, so even the
    STOCHASTIC GMM eval sampling agrees between the parallel and sequential
    validation paths (grouping-invariant streams)."""
    import copy

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    tmp, param = cylinder_env
    gparam = copy.deepcopy(param)
    gparam["model"]["num_mixture_components"] = 2
    trainer, loader, val_ds = _make(gparam, tmp)
    trainer.init_state(loader.peek(), num_steps=10)

    trainer.parallel_validation = False
    rmse_seq = trainer.validate(val_ds, save_rollout=False)
    trainer.parallel_validation = True
    rmse_par = trainer.validate(val_ds, save_rollout=False)
    assert rmse_par == pytest.approx(rmse_seq, rel=1e-5)


def test_cosine_warmup_schedule_shape_and_clamp():
    """Reference CosineWarmupScheduler semantics (graphphysics/utils/
    scheduler.py:41-67): linear warmup MULTIPLIED by the cosine, 1e-3 floor —
    plus our clamp at max_iters (the raw cosine would ramp back up past pi
    if more steps run than the schedule was built for)."""
    import numpy as np

    from graphphysics_tpu.training.schedule import cosine_warmup_schedule

    lr, warmup, max_iters = 1e-3, 4, 16
    sched = cosine_warmup_schedule(lr, warmup, max_iters)
    lrs = np.array([float(sched(s)) for s in range(2 * max_iters)])

    # warmup: factor = (s+1)/warmup * cosine
    for s in range(warmup):
        expect = lr * 0.5 * (1 + np.cos(np.pi * (s + 1) / max_iters)) * (s + 1) / warmup
        np.testing.assert_allclose(lrs[s], max(expect, lr * 1e-3), rtol=1e-6)
    # monotone decay after warmup
    assert (np.diff(lrs[warmup - 1 : max_iters]) <= 1e-12).all()
    # floor at min_lr_factor
    np.testing.assert_allclose(lrs[max_iters - 1], lr * 1e-3, rtol=1e-6)
    # clamp: steps past max_iters stay at the floor, never ramp back up
    assert (lrs[max_iters:] == lrs[max_iters - 1]).all()


def test_checkpoint_metadata_embedded_atomically(tmp_path):
    """Metadata rides inside the msgpack state file (one os.replace commits
    both): a stale sidecar left by a crash between the two writes must never
    win over the embedded copy, and checkpoints without a sidecar still
    restore their metadata."""
    import json

    import jax.numpy as jnp

    from graphphysics_tpu.training.checkpoint import (
        load_checkpoint,
        load_metadata,
        save_checkpoint,
    )

    state = {"a": jnp.arange(4.0), "b": {"c": jnp.zeros((2, 2))}}
    ckpt = str(tmp_path / "state.msgpack")
    save_checkpoint(ckpt, state, metadata={"epoch": 3, "batch_offset": 17})

    # simulate the crash window: the sidecar still holds the PREVIOUS save's
    # metadata while the state file is new
    with open(ckpt + ".meta.json", "w") as f:
        json.dump({"epoch": 2, "batch_offset": 99}, f)
    assert load_metadata(ckpt) == {"epoch": 3, "batch_offset": 17}

    # no sidecar at all: embedded copy still serves
    import os

    os.remove(ckpt + ".meta.json")
    assert load_metadata(ckpt) == {"epoch": 3, "batch_offset": 17}

    # and the metadata key never leaks into the restored state tree
    restored = load_checkpoint(ckpt, state)
    assert set(restored.keys()) == {"a", "b"}
    import numpy as np

    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))


def test_load_checkpoint_with_metadata_single_parse(tmp_path):
    """The combined loader returns (state, metadata) equal to the two-call
    path — resume should not deserialize the full state payload twice."""
    import jax.numpy as jnp

    from graphphysics_tpu.training.checkpoint import (
        load_checkpoint,
        load_checkpoint_with_metadata,
        load_metadata,
        save_checkpoint,
    )

    state = {"a": jnp.arange(6.0), "b": {"c": jnp.ones((3, 2))}}
    ckpt = str(tmp_path / "state.msgpack")
    save_checkpoint(ckpt, state, metadata={"epoch": 7, "batch_offset": 2})

    got_state, got_meta = load_checkpoint_with_metadata(ckpt, state)
    assert got_meta == load_metadata(ckpt) == {"epoch": 7, "batch_offset": 2}
    ref_state = load_checkpoint(ckpt, state)
    np.testing.assert_array_equal(np.asarray(got_state["a"]),
                                  np.asarray(ref_state["a"]))
    np.testing.assert_array_equal(np.asarray(got_state["b"]["c"]),
                                  np.asarray(ref_state["b"]["c"]))
    # legacy checkpoint without embedded metadata: sidecar fallback
    import json as _json
    import os as _os

    from flax.serialization import msgpack_restore, msgpack_serialize

    with open(ckpt, "rb") as f:
        payload = msgpack_restore(f.read())
    payload.pop("__metadata__")
    with open(ckpt, "wb") as f:
        f.write(msgpack_serialize(payload))
    _, meta2 = load_checkpoint_with_metadata(ckpt, state)
    assert meta2 == {"epoch": 7, "batch_offset": 2}  # from .meta.json
    _os.remove(ckpt + ".meta.json")
    _, meta3 = load_checkpoint_with_metadata(ckpt, state)
    assert meta3 == {}


def test_cli_export_produces_loadable_artifacts(cylinder_env, tmp_path,
                                                monkeypatch):
    """grph export: checkpoint -> StableHLO artifacts; the eval artifact
    must reproduce the live eval forward on the val dataset's first frame."""
    tmp, param = cylinder_env
    cfg_path = tmp_path / "cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(param, f)
    monkeypatch.chdir(tmp_path)
    from graphphysics_tpu.cli.train import main as train_main

    rc = train_main([
        "--training_parameters_path", str(cfg_path),
        "--num_epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--val_trajectories", "1",
    ])
    assert rc == 0
    ckpt = tmp_path / "checkpoints" / "state.msgpack"

    from graphphysics_tpu.cli.export import main as export_main

    rc = export_main([
        "--training_parameters_path", str(cfg_path),
        "--model_path", str(ckpt),
        "--output_dir", str(tmp_path / "exported"),
        "--rollout",
    ])
    assert rc == 0
    eval_path = tmp_path / "exported" / "eval_step.stablehlo"
    roll_path = tmp_path / "exported" / "rollout.stablehlo"
    assert eval_path.exists() and roll_path.exists()

    # the artifact must match the live forward
    from graphphysics_tpu.training.checkpoint import load_checkpoint
    from graphphysics_tpu.utils.export import load_eval_step_file

    val_pre = get_preprocessing(param, remove_noise=True)
    ds = get_dataset(param, val_pre, switch_to_val=True)
    trainer = Trainer(param)
    g = ds[0]
    trainer.init_state(g, num_steps=1)
    trainer.state = load_checkpoint(str(ckpt), trainer.state)
    variables = {
        "params": trainer.state["params"],
        "normalizer": trainer.state["normalizer"],
    }
    import jax

    gj = jax.tree_util.tree_map(np.asarray, g)
    _, _, live = trainer.sim.apply(variables, gj, is_training=False)
    step = load_eval_step_file(str(eval_path))
    aot = step(gj)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live),
                               rtol=1e-5, atol=1e-6)


def _budget_probe_graph(n, e, skew, seed=0):
    """Same (nodes, edges) size_key either way; ``skew`` points every
    receiver into part 0 of a 2-way cut, overflowing budgets derived from
    the balanced ring."""
    from graphphysics_tpu.core.graph import pad_graph_np

    r = np.random.default_rng(seed)
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = 0
    pos = r.normal(size=(n, 2)).astype(np.float32)
    s = (np.arange(e, dtype=np.int32)) % n
    if skew:
        t = (np.arange(e, dtype=np.int32)) % (n // 2)
    else:
        t = ((np.arange(e) + 1) % n).astype(np.int32)
    return pad_graph_np(
        x, pos, s.astype(np.int32), t.astype(np.int32), n_pad=n, e_pad=e,
        edge_attr=r.normal(size=(e, 3)).astype(np.float32),
        y=np.zeros((n, 2), np.float32), node_type_index=2,
    )


def test_partition_budget_growth(cylinder_env):
    """A batch exceeding the canonical static budgets re-derives them from
    itself (one recompile) instead of aborting — partition_edge_headroom=1.0
    stays safe against outlier batches (docs/scaling.md projected-ICI)."""
    tmp, param = cylinder_env
    trainer = Trainer(
        param, graph_partition=2, partition_edge_headroom=1.0,
        checkpoint_dir=str(tmp / "ckpt_bg"), metrics_path=None,
        rollout_dir=None,
    )
    g_bal = _budget_probe_graph(256, 256, skew=False)
    p1 = trainer._partition_graph(g_bal)
    ((eb0, hb0, _),) = trainer._part_budgets.values()
    assert p1.senders.shape[1] == eb0 and trainer._budget_gen == 0

    g_skew = _budget_probe_graph(256, 256, skew=True)
    p2 = trainer._partition_graph(g_skew)
    ((eb1, hb1, _),) = trainer._part_budgets.values()
    assert trainer._budget_gen == 1
    assert eb1 > eb0 and hb1 > hb0
    assert p2.senders.shape[1] == eb1
    # earlier shapes keep partitioning under the (monotone) grown budgets
    assert trainer._partition_graph(g_bal).senders.shape[1] == eb1
    assert trainer._budget_gen == 1  # no further growth


def test_partition_budget_growth_disabled_raises(cylinder_env):
    tmp, param = cylinder_env
    trainer = Trainer(
        param, graph_partition=2, partition_edge_headroom=1.0,
        partition_budget_growth=False,
        checkpoint_dir=str(tmp / "ckpt_bgoff"), metrics_path=None,
        rollout_dir=None,
    )
    trainer._partition_graph(_budget_probe_graph(256, 256, skew=False))
    with pytest.raises(ValueError, match="partition_edge_headroom"):
        trainer._partition_graph(_budget_probe_graph(256, 256, skew=True))


def test_partition_budget_growth_dp_mid_batch(cylinder_env):
    """When a LATER graph of a stacked DP batch grows the budgets, the
    whole batch re-partitions so every stacked part shares the grown
    padded shape."""
    from graphphysics_tpu.core.graph import stack_graphs

    tmp, param = cylinder_env
    trainer = Trainer(
        param, data_parallel=True, graph_partition=2, num_devices=4,
        partition_edge_headroom=1.0,
        checkpoint_dir=str(tmp / "ckpt_bgdp"), metrics_path=None,
        rollout_dir=None,
    )
    batch = stack_graphs([
        _budget_probe_graph(256, 256, skew=False),
        _budget_probe_graph(256, 256, skew=True),
    ])
    trainer.init_state(batch, num_steps=4)  # builds the (data, graph) mesh
    trainer._budget_gen = 0
    trainer._part_budgets.clear()  # re-derive lazily from the batch itself
    out = trainer._put_partitioned_batch(batch)
    assert trainer._budget_gen == 1
    ((eb, _, _),) = trainer._part_budgets.values()
    # [B, P, eb]: both graphs padded to the grown edge budget
    assert out.senders.shape == (2, 2, eb)
    assert np.isfinite(np.asarray(out.x)).all()


def test_load_metadata_prefer_sidecar_skips_state_parse(tmp_path):
    """prefer_sidecar=True reads .meta.json without deserializing the full
    state payload (advisory reads like the W&B run id on resume)."""
    from graphphysics_tpu.training.checkpoint import load_metadata

    ckpt = str(tmp_path / "s.msgpack")
    with open(ckpt, "wb") as f:
        f.write(b"\x81")  # truncated msgpack: any state parse would raise
    with open(ckpt + ".meta.json", "w") as f:
        json.dump({"wandb_run_id": "abc"}, f)
    meta = load_metadata(ckpt, prefer_sidecar=True)
    assert meta["wandb_run_id"] == "abc"


def test_shrink_for_init_preserves_param_shapes(cylinder_env):
    """graph_partition init runs the flax init forward on a small subgraph
    (the full mesh would OOM one device for exactly the meshes the flag
    targets) — parameter shapes must equal the full-graph init's."""
    import jax

    tmp, param = cylinder_env
    trainer = Trainer(
        param, graph_partition=2, metrics_path=None, rollout_dir=None,
        checkpoint_dir=str(tmp / "ckpt_shrink"),
    )
    g = _budget_probe_graph(4096, 16384, skew=False)
    small = trainer._shrink_for_init(g)
    assert small.num_nodes <= 2048 and small.num_edges <= 8192
    from graphphysics_tpu.training.parse_parameters import get_simulator

    sim = get_simulator(param)
    v_small = sim.init({"params": jax.random.key(0)}, jax.device_put(small))
    v_full = sim.init({"params": jax.random.key(0)}, jax.device_put(g))
    assert jax.tree_util.tree_map(
        lambda a: a.shape, v_small["params"]
    ) == jax.tree_util.tree_map(lambda a: a.shape, v_full["params"])


def test_cli_export_partitioned_artifact(cylinder_env, tmp_path, monkeypatch):
    """grph export --graph_partition 4: the multi-device artifact loads on
    a 4-device mesh and reproduces the single-device eval forward."""
    tmp, param = cylinder_env
    cfg_path = tmp_path / "cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(param, f)
    monkeypatch.chdir(tmp_path)
    from graphphysics_tpu.cli.train import main as train_main

    rc = train_main([
        "--training_parameters_path", str(cfg_path),
        "--num_epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--val_trajectories", "1",
    ])
    assert rc == 0
    ckpt = tmp_path / "checkpoints" / "state.msgpack"

    from graphphysics_tpu.cli.export import main as export_main

    rc = export_main([
        "--training_parameters_path", str(cfg_path),
        "--model_path", str(ckpt),
        "--output_dir", str(tmp_path / "exported"),
        "--graph_partition", "4",
    ])
    assert rc == 0
    part_path = tmp_path / "exported" / "eval_step_p4.stablehlo"
    assert part_path.exists()

    import jax

    from graphphysics_tpu.parallel import make_mesh, shard_batch
    from graphphysics_tpu.parallel.graph_partition import unpartition_rows
    from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
    from graphphysics_tpu.training.checkpoint import load_checkpoint
    from graphphysics_tpu.utils.export import load_partitioned_eval_step
    from graphphysics_tpu.dataset import GraphLoader

    val_pre = get_preprocessing(param, remove_noise=True)
    ds = get_dataset(param, val_pre, switch_to_val=True)
    trainer = Trainer(param)
    g = GraphLoader(ds, batch_size=1, shuffle=False, prefetch=0).peek()
    trainer.init_state(g, num_steps=1)
    trainer.state = load_checkpoint(str(ckpt), trainer.state)
    variables = {
        "params": trainer.state["params"],
        "normalizer": trainer.state["normalizer"],
    }
    gj = jax.tree_util.tree_map(np.asarray, g)
    _, _, live = trainer.sim.apply(variables, gj, is_training=False)

    ptrainer = Trainer(param, graph_partition=4)
    ptrainer.sim = trainer.sim
    parts = ptrainer._partition_graph(gj)
    mesh = make_mesh(4, (GRAPH_AXIS,))
    import jax.numpy as jnp

    placed = shard_batch(
        jax.tree_util.tree_map(jnp.asarray, parts), mesh, GRAPH_AXIS
    )
    with open(part_path, "rb") as f:
        step = load_partitioned_eval_step(f.read())
    assert step.nr_devices == 4
    got = unpartition_rows(np.asarray(step(placed)))
    np.testing.assert_allclose(
        got, np.asarray(live), rtol=2e-4, atol=2e-5
    )
