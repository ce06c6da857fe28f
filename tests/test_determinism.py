"""Determinism self-checks (utils/determinism.py): dataset items and jitted
train steps must replay bitwise-identically — the contract behind exact
mid-epoch resume and grouping-invariant validation."""

import numpy as np
import pytest

from graphphysics_tpu.utils.determinism import (
    check_item_determinism,
    check_step_determinism,
)


@pytest.fixture()
def cylinder_ds(tmp_path):
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1,
                                           steps=6, nx=8, ny=6)
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 1, "hidden_size": 8,
                  "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0.02,
                                              "noise_index_start": [0],
                                              "noise_index_end": [2],
                                              "masking": 0},
                            "world_pos_parameters": {"use": False}},
    }
    return get_dataset(param, get_preprocessing(param)), param


def test_item_determinism_with_noise(cylinder_ds):
    """Noise injection is PRNG-keyed per (seed, epoch, index): rebuilding an
    item must be bitwise-identical, including the noisy columns."""
    ds, _ = cylinder_ds
    report = check_item_determinism(ds, 1)
    assert report["deterministic"], report["mismatches"]
    # sanity: noise actually fired (items differ across epochs)
    g0 = ds[1]
    ds.set_epoch(1)
    g1 = ds[1]
    ds.set_epoch(0)
    assert not np.array_equal(np.asarray(g0.x), np.asarray(g1.x))


def test_step_determinism_with_donated_state(cylinder_ds):
    """A jitted, buffer-donating train step replayed from cloned state must
    be bitwise-identical."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.training.losses import l2_loss
    from graphphysics_tpu.training.parse_parameters import get_simulator

    ds, param = cylinder_ds
    sim = get_simulator(param)
    graph = jax.tree_util.tree_map(jnp.asarray, ds[0])
    variables = sim.init({"params": jax.random.key(0)}, graph)
    tx = optax.adamw(1e-3)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
    }

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, graph):
        def loss_fn(p):
            (out, tgt, _), mut = sim.apply(
                {"params": p, "normalizer": state["normalizer"]}, graph,
                is_training=True, mutable=["normalizer"],
            )
            nt = graph.x[:, 2].astype(jnp.int32)
            return l2_loss(tgt, out, nt,
                           [NodeType.NORMAL, NodeType.OUTFLOW],
                           node_valid=graph.node_mask), mut["normalizer"]

        (loss, norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt = tx.update(grads, state["opt_state"], state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates),
            "normalizer": norm,
            "opt_state": opt,
        }, loss

    report = check_step_determinism(step, state, graph, runs=3)
    assert report["deterministic"], report["mismatches"]


def test_mismatch_is_reported():
    """The comparison actually bites: perturbed trees report leaf paths."""
    a = {"w": np.ones((4,), np.float32), "b": np.zeros((2,), np.float32)}
    b = {"w": np.ones((4,), np.float32), "b": np.full((2,), 1e-9, np.float32)}

    calls = [a, b]

    def fake_step(state, batch):
        return calls.pop(0)

    report = check_step_determinism(fake_step, {}, {}, runs=2)
    assert not report["deterministic"]
    assert any("b" in m for m in report["mismatches"])


def test_structure_mismatch_is_reported():
    """Extra/missing leaves must be reported as a structure mismatch, not
    silently zip-truncated into a false 'deterministic' verdict."""
    calls = [
        {"w": np.ones((4,), np.float32)},
        {"w": np.ones((4,), np.float32), "extra": np.zeros((1,), np.float32)},
    ]

    def fake_step(state, batch):
        return calls.pop(0)

    report = check_step_determinism(fake_step, {}, {}, runs=2)
    assert not report["deterministic"]
    assert any("structure" in m for m in report["mismatches"])
