"""SPMD data-parallel tests on the virtual 8-device CPU mesh: the sharded
train step must reproduce single-device results (loss, params, normalizer
statistics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphphysics_tpu.core.graph import flatten_batched_graph, stack_graphs
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
from graphphysics_tpu.training.losses import l2_loss
from tests.conftest import make_test_graph


def _setup(batch=8):
    graphs = [make_test_graph(seed=s) for s in range(batch)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE,
        edge_input_size=3,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1,
        node_input_size=cfg.node_input_size,
        edge_input_size=3,
        output_size=2,
        hidden_size=8,
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
    return sim, tx, state, stacked


def _single_device_step(sim, tx, state, stacked):
    graph = flatten_batched_graph(stacked)

    def loss_fn(p):
        (out, tgt, _), mut = sim.apply(
            {"params": p, "normalizer": state["normalizer"]},
            graph,
            is_training=True,
            mutable=["normalizer"],
        )
        nt = graph.x[:, 2].astype(jnp.int32)
        loss = l2_loss(
            tgt, out, nt, [NodeType.NORMAL, NodeType.OUTFLOW],
            node_valid=graph.node_mask,
        )
        return loss, mut["normalizer"]

    (loss, norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
    updates, opt = tx.update(grads, state["opt_state"], state["params"])
    return optax.apply_updates(state["params"], updates), norm, float(loss)


def test_dp_step_matches_single_device():
    sim, tx, state, stacked = _setup(batch=8)
    mesh = make_mesh(8)
    step = make_dp_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    batch = shard_batch(stacked, mesh)
    # reference first: the DP step donates its state buffers
    ref_params, ref_norm, ref_loss = _single_device_step(sim, tx, state, stacked)
    new_state, loss = step(state, batch)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state["params"]),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    # normalizer statistics identical to single-device accumulation
    got = new_state["normalizer"]["node_normalizer"]["state"]
    exp = ref_norm["node_normalizer"]["state"]
    np.testing.assert_allclose(float(got.acc_count), float(exp.acc_count))
    np.testing.assert_allclose(
        float(got.num_accumulations), float(exp.num_accumulations)
    )
    np.testing.assert_allclose(
        np.asarray(got.acc_sum), np.asarray(exp.acc_sum), rtol=1e-4, atol=1e-5
    )


def test_dp_step_runs_multiple_steps():
    sim, tx, state, stacked = _setup(batch=8)
    mesh = make_mesh(8)
    step = make_dp_train_step(sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh)
    batch = shard_batch(stacked, mesh)
    losses = []
    for _ in range(3):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert float(state["normalizer"]["node_normalizer"]["state"].num_accumulations) == 3.0


def test_mesh_uses_requested_devices():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("data",)
