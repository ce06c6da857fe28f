"""Gradient-accumulation train step (training/microbatch.py): scanning M
microbatches per optimizer step must reproduce the plain single step on the
concat of the microbatches — params, loss, AND normalizer statistics
(including the once-per-step accumulation-call counter)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphphysics_tpu.core.normalizer import MAX_ACCUMULATIONS
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.training.microbatch import make_microbatch_train_step
from tests.test_parallel import _setup, _single_device_step

MASKS = [NodeType.NORMAL, NodeType.OUTFLOW]


def _copy_state(state):
    return jax.tree_util.tree_map(jnp.array, state)


def test_microbatch_step_matches_concat_step():
    sim, tx, state, stacked = _setup(batch=4)
    step = make_microbatch_train_step(sim, tx, MASKS)
    # reference first: the microbatch step donates its state buffers
    ref_params, ref_norm, ref_loss = _single_device_step(sim, tx, state, stacked)
    new_state, loss = step(_copy_state(state), stacked)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state["params"]),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    got = new_state["normalizer"]["node_normalizer"]["state"]
    exp = ref_norm["node_normalizer"]["state"]
    np.testing.assert_allclose(float(got.acc_count), float(exp.acc_count))
    np.testing.assert_allclose(
        float(got.num_accumulations), float(exp.num_accumulations)
    )
    np.testing.assert_allclose(
        np.asarray(got.acc_sum), np.asarray(exp.acc_sum), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.acc_sum_sq), np.asarray(exp.acc_sum_sq),
        rtol=1e-4, atol=1e-5,
    )


def test_microbatch_counter_advances_once_per_step():
    sim, tx, state, stacked = _setup(batch=4)
    step = make_microbatch_train_step(sim, tx, MASKS)
    losses = []
    for _ in range(3):
        state, loss = step(state, stacked)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    norm = state["normalizer"]["node_normalizer"]["state"]
    assert float(norm.num_accumulations) == 3.0  # NOT 3 * M


def test_microbatch_respects_accumulation_cap():
    """Once a normalizer hit MAX_ACCUMULATIONS its statistics must stay
    frozen through the microbatch scan (the counter-reopening trick must not
    resurrect capped normalizers)."""
    sim, tx, state, stacked = _setup(batch=4)
    import dataclasses

    from graphphysics_tpu.core.normalizer import NormalizerState

    def cap(s):
        return dataclasses.replace(
            s, num_accumulations=jnp.full((), float(MAX_ACCUMULATIONS))
        )

    state["normalizer"] = jax.tree_util.tree_map(
        cap,
        state["normalizer"],
        is_leaf=lambda x: isinstance(x, NormalizerState),
    )
    before = jax.tree_util.tree_map(np.asarray, state["normalizer"])
    step = make_microbatch_train_step(sim, tx, MASKS)
    new_state, loss = step(state, stacked)
    assert np.isfinite(float(loss))
    after = new_state["normalizer"]
    for b, a in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_microbatch_gmm_loss_parity():
    """Gradient accumulation with the diagonal-GMM NLL head matches the
    plain concat-batch GMM step."""
    import optax

    from graphphysics_tpu.core.graph import flatten_batched_graph, stack_graphs
    from graphphysics_tpu.models.processors import EncodeProcessDecode
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.training.losses import diagonal_gmm_nll_loss
    from tests.conftest import make_test_graph

    K, d = 2, 2
    graphs = [make_test_graph(seed=s) for s in range(4)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=d,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=d, hidden_size=8,
        num_mixture_components=K, use_diagonal=True,
    )
    sim = Simulator(config=cfg, model=model)
    flat = flatten_batched_graph(stacked)
    variables = sim.init({"params": jax.random.key(0)}, flat)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    def ref_step(state, graph):
        def loss_fn(p):
            (out, tgt, _), mut = sim.apply(
                {"params": p, "normalizer": state["normalizer"]}, graph,
                is_training=True, mutable=["normalizer"],
            )
            nt = graph.x[:, 2].astype(jnp.int32)
            loss = diagonal_gmm_nll_loss(
                tgt, out, nt, MASKS, d=d, K=K, node_valid=graph.node_mask
            )
            return loss, mut["normalizer"]

        (loss, norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt = tx.update(grads, state["opt_state"], state["params"])
        return optax.apply_updates(state["params"], updates), float(loss)

    ref_params, ref_loss = ref_step(state, flat)
    step = make_microbatch_train_step(
        sim, tx, MASKS, loss_kind="diag_gmm", gmm_kwargs=dict(d=d, K=K)
    )
    new_state, loss = step(_copy_state(state), stacked)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state["params"]),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_trainer_gradient_accumulation_fit(tmp_path):
    """Trainer(gradient_accumulation=True) trains with collate='stack' and
    decreases the loss (end-to-end wiring)."""
    import os
    import shutil

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(str(tmp_path), num_traj=1, steps=8,
                                           nx=8, ny=6)
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 1, "hidden_size": 8,
                  "node_input_size": 2, "output_size": 2, "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {
            "preprocessing": {"noise": 0.02, "noise_index_start": [0],
                              "noise_index_end": [2], "masking": 0},
            "world_pos_parameters": {"use": False},
        },
    }
    ds = get_dataset(param, get_preprocessing(param))
    loader = GraphLoader(ds, batch_size=2, shuffle=True, prefetch=0,
                         collate="stack")
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=2, gradient_accumulation=True,
        checkpoint_dir=str(tmp_path / "ckpt"), metrics_path=None,
        rollout_dir=None, log_every=100,
    )
    hist = trainer.fit(loader, num_epochs=3)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
