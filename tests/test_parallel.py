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


@pytest.mark.parametrize("halo", [False, True])
def test_dp_graph_parallel_2d_step_matches_dp(halo):
    """Combined (data x graph) 2-D step: batch of 2 graphs, each
    edge-partitioned into 4, over a 2x4 mesh — must reproduce the pure-DP
    step on the unpartitioned graphs (and hence the single-device step)."""
    from graphphysics_tpu.parallel import (
        GRAPH_AXIS,
        make_dp_graph_parallel_train_step,
    )
    from graphphysics_tpu.parallel.graph_partition import (
        partition_graph_halo_np,
        partition_graph_np,
    )
    from graphphysics_tpu.parallel.mesh import DATA_AXIS
    from graphphysics_tpu.topology.build import to_undirected
    from graphphysics_tpu.core.graph import pad_graph_np
    from jax.sharding import NamedSharding, PartitionSpec as P

    def mesh_graph(seed):
        n = 256
        r = np.random.default_rng(seed)
        s = r.integers(0, n, 3 * n).astype(np.int32)
        t = (s + r.integers(1, 16, 3 * n)).astype(np.int32) % n
        S, R = to_undirected(s, t)
        x = r.normal(size=(n, 4)).astype(np.float32)
        x[:, 2] = r.integers(0, 7, n)
        pos = r.normal(size=(n, 2)).astype(np.float32)
        ea = r.normal(size=(len(S), 3)).astype(np.float32)
        y = r.normal(size=(n, 2)).astype(np.float32)
        return pad_graph_np(x, pos, S, R, n_pad=n, e_pad=1664,
                            edge_attr=ea, y=y, node_type_index=2)

    graphs = [mesh_graph(s) for s in (10, 11)]

    # uniform budgets so the two partitioned graphs stack to one static shape
    if halo:
        trial = [partition_graph_halo_np(g, 4) for g in graphs]
        eb = max(t.senders.shape[1] for t in trial)
        hb = max(t.halo_send_idx.shape[2] for t in trial)
        parts = [
            partition_graph_halo_np(g, 4, edge_budget_local=eb, halo_budget=hb)
            for g in graphs
        ]
    else:
        trial = [partition_graph_np(g, 4) for g in graphs]
        eb = max(t.senders.shape[1] for t in trial)
        parts = [partition_graph_np(g, 4, edge_budget_local=eb) for g in graphs]

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=8,
    )
    sim = Simulator(config=cfg, model=model)
    gj0 = jax.tree_util.tree_map(jnp.asarray, graphs[0])
    variables = sim.init({"params": jax.random.key(0)}, gj0)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)

    def fresh_state():
        # deep-copy: the train steps donate their state buffers
        return jax.tree_util.tree_map(jnp.copy, {
            "params": variables["params"],
            "normalizer": variables["normalizer"],
            "opt_state": tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        })

    masks = [NodeType.NORMAL, NodeType.OUTFLOW]

    # reference: pure DP over the 2 unpartitioned graphs on a 2-device mesh,
    # two successive steps (the second exercises the updated params+stats)
    mesh_dp = make_mesh(2, (DATA_AXIS,))
    dp_step = make_dp_train_step(sim, tx, masks, mesh_dp)
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    dp_batch = shard_batch(stacked, mesh_dp, DATA_AXIS)
    ref_state, ref_loss1 = dp_step(fresh_state(), dp_batch)
    ref_state, ref_loss2 = dp_step(ref_state, dp_batch)

    # 2-D: (data=2, graph=4) mesh over the batch of partitioned graphs
    mesh2d = make_mesh(8, (DATA_AXIS, GRAPH_AXIS), shape=(2, 4))
    step2d = make_dp_graph_parallel_train_step(sim, tx, masks, mesh2d)
    batch2d = jax.tree_util.tree_map(jnp.asarray, stack_graphs(parts))
    sharding = NamedSharding(mesh2d, P(DATA_AXIS, GRAPH_AXIS))
    batch2d = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch2d
    )
    new_state, loss1 = step2d(fresh_state(), batch2d)
    new_state, loss2 = step2d(new_state, batch2d)

    # Step-1 loss: same graphs, same params — near-exact. Step-2 loss runs on
    # params that went through one Adam update; the model's init-time RMSNorm
    # sharpness (grad ~1e6 at loss~1, ref-parity) means fp reassociation
    # across partitions can flip the SIGN of near-zero grads, i.e. a few
    # params differ by up to 2*lr — so the step-2 comparison is tolerant.
    np.testing.assert_allclose(float(loss1), float(ref_loss1), rtol=2e-5)
    np.testing.assert_allclose(float(loss2), float(ref_loss2), rtol=5e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state["normalizer"]),
        jax.tree_util.tree_leaves(new_state["normalizer"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)
    # params: equal except for the sign-flip ±2*lr cases described above
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state["params"]),
        jax.tree_util.tree_leaves(new_state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=4.2e-3)


def _setup_tp(hidden=16, mp=2, transformer=False):
    graphs = [make_test_graph(seed=s) for s in range(2)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    graph = flatten_batched_graph(stacked)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE,
        edge_input_size=0 if transformer else 3,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
    )
    if transformer:
        from graphphysics_tpu.models.processors import EncodeTransformDecode

        model = EncodeTransformDecode(
            message_passing_num=mp,
            node_input_size=cfg.node_input_size,
            output_size=2,
            hidden_size=hidden,
            num_heads=2,
        )
    else:
        model = EncodeProcessDecode(
            message_passing_num=mp,
            node_input_size=cfg.node_input_size,
            edge_input_size=3,
            output_size=2,
            hidden_size=hidden,
        )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    # SGD, not adamw: at step 1 adam's update is ~sign(grad), so the fp
    # reduction-order noise of the sharded contractions flips near-zero
    # grads' update signs — SGD keeps param deltas linear in the grads,
    # which is what sharded-vs-single-device parity actually tests.
    tx = optax.sgd(1e-2, momentum=0.9)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    return sim, tx, state, stacked, graph


@pytest.mark.parametrize("transformer", [False, True])
def test_tp_step_matches_single_device(transformer):
    from jax.sharding import PartitionSpec as P

    from graphphysics_tpu.parallel import (
        MODEL_AXIS,
        make_mesh,
        make_tp_train_step,
        shard_tp_state,
        tp_param_specs,
    )

    sim, tx, state, stacked, graph = _setup_tp(transformer=transformer)

    # the spec tree shards every matmul-bearing kernel
    specs = tp_param_specs(state["params"])
    kernel_specs = [
        s
        for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]
        if jax.tree_util.keystr(p).endswith("['kernel']")
    ]
    assert kernel_specs and all(MODEL_AXIS in s for s in kernel_specs)

    ref_params, ref_norm, ref_loss = _single_device_step(sim, tx, state, stacked)

    mesh = make_mesh(8, (MODEL_AXIS,))
    tp_state = shard_tp_state(state, mesh)
    # params (and adamw moments) actually land sharded on the mesh
    k = tp_state["params"]["model"]["nodes_encoder"]["dense_0"]["kernel"]
    assert MODEL_AXIS in k.sharding.spec
    mu = tp_state["opt_state"][0].trace["model"]["nodes_encoder"]["dense_0"][
        "kernel"
    ]
    assert MODEL_AXIS in mu.sharding.spec

    step = make_tp_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    new_state, loss = step(tp_state, jax.device_put(graph))

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state["params"]),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
    # updated params keep the TP layout (stable across steps)
    k2 = new_state["params"]["model"]["nodes_encoder"]["dense_0"]["kernel"]
    assert MODEL_AXIS in k2.sharding.spec
    # and the step composes: run two more
    for _ in range(2):
        new_state, loss = step(new_state, jax.device_put(graph))
    assert np.isfinite(float(loss))


def test_pp_step_matches_single_device():
    """GPipe pipeline step (4 stages x 4 microbatches) == single-device step
    on the concat of the microbatches."""
    from graphphysics_tpu.parallel import (
        PIPE_AXIS,
        make_mesh,
        make_pp_train_step,
        shard_pp_state,
    )

    M = 4
    graphs = [make_test_graph(seed=s) for s in range(M)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    graph = flatten_batched_graph(stacked)
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
        message_passing_num=4,
        node_input_size=cfg.node_input_size,
        edge_input_size=3,
        output_size=2,
        hidden_size=8,
        scan_blocks=True,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    ref_params, ref_norm, ref_loss = _single_device_step(sim, tx, state, stacked)

    mesh = make_mesh(4, (PIPE_AXIS,))
    pp_state = shard_pp_state(state, mesh)
    k = pp_state["params"]["model"]["blocks"]["block"]["edge_block"]["dense_0"][
        "kernel"
    ]
    assert PIPE_AXIS in k.sharding.spec  # layer axis genuinely sharded

    step = make_pp_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    new_state, loss = step(pp_state, stacked)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_state["params"])[0],
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )
    # normalizer statistics identical to single-device accumulation
    got = new_state["normalizer"]["node_normalizer"]["state"]
    exp = ref_norm["node_normalizer"]["state"]
    np.testing.assert_allclose(float(got.acc_count), float(exp.acc_count))
    np.testing.assert_allclose(
        np.asarray(got.acc_sum), np.asarray(exp.acc_sum), rtol=1e-4, atol=1e-5
    )
    # composes across steps
    for _ in range(2):
        new_state, loss = step(new_state, stacked)
    assert np.isfinite(float(loss))


def test_tp_step_compiles_once():
    """The TP step's output layout must equal its input layout (params AND
    optimizer moments constrained), so step 2 hits the jit cache."""
    from graphphysics_tpu.parallel import (
        MODEL_AXIS,
        make_mesh,
        make_tp_train_step,
        shard_tp_state,
    )

    sim, tx, state, stacked, graph = _setup_tp()
    mesh = make_mesh(8, (MODEL_AXIS,))
    tp_state = shard_tp_state(state, mesh)
    step = make_tp_train_step(sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh)
    g = jax.device_put(graph)
    tp_state, _ = step(tp_state, g)
    n_compiles = step._cache_size()
    tp_state, _ = step(tp_state, g)
    tp_state, _ = step(tp_state, g)
    assert step._cache_size() == n_compiles == 1


def test_pp_transformer_step_matches_single_device():
    """GPipe over transformer blocks (node-table-only rotation)."""
    from graphphysics_tpu.models.processors import EncodeTransformDecode
    from graphphysics_tpu.parallel import (
        PIPE_AXIS,
        make_mesh,
        make_pp_train_step,
        shard_pp_state,
    )

    M = 4
    graphs = [make_test_graph(seed=s, num_edge_features=0) for s in range(M)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    graph = flatten_batched_graph(stacked)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE,
        edge_input_size=0,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
    )
    model = EncodeTransformDecode(
        message_passing_num=4,
        node_input_size=cfg.node_input_size,
        output_size=2,
        hidden_size=8,
        num_heads=2,
        scan_blocks=True,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    ref_params, ref_norm, ref_loss = _single_device_step(sim, tx, state, stacked)

    mesh = make_mesh(4, (PIPE_AXIS,))
    pp_state = shard_pp_state(state, mesh)
    step = make_pp_train_step(sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh)
    new_state, loss = step(pp_state, stacked)

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_state["params"])[0],
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.parametrize("use_diagonal", [True, False])
def test_pp_gmm_step_matches_single_device(use_diagonal):
    """GPipe with a GMM decoder head (diagonal or full-covariance) ==
    single-device NLL step."""
    from graphphysics_tpu.parallel import (
        PIPE_AXIS,
        make_mesh,
        make_pp_train_step,
        shard_pp_state,
    )
    from graphphysics_tpu.training.losses import (
        diagonal_gmm_nll_loss,
        gmm_nll_loss,
    )

    M = 4
    graphs = [make_test_graph(seed=s) for s in range(M)]
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(graphs))
    graph = flatten_batched_graph(stacked)
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
        message_passing_num=4,
        node_input_size=cfg.node_input_size,
        edge_input_size=3,
        output_size=2,
        hidden_size=8,
        num_mixture_components=3,
        use_diagonal=use_diagonal,
        scan_blocks=True,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    def loss_fn(p):
        (out, tgt, _), mut = sim.apply(
            {"params": p, "normalizer": state["normalizer"]},
            graph,
            is_training=True,
            mutable=["normalizer"],
        )
        nt = graph.x[:, 2].astype(jnp.int32)
        nll = diagonal_gmm_nll_loss if use_diagonal else gmm_nll_loss
        loss = nll(
            tgt, out, nt, [NodeType.NORMAL, NodeType.OUTFLOW],
            d=2, K=3, node_valid=graph.node_mask,
        )
        return loss, mut["normalizer"]

    (ref_loss, ref_norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state["params"]
    )
    updates, _ = tx.update(grads, state["opt_state"], state["params"])
    ref_params = optax.apply_updates(state["params"], updates)

    mesh = make_mesh(4, (PIPE_AXIS,))
    pp_state = shard_pp_state(state, mesh)
    step = make_pp_train_step(sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh)
    new_state, loss = step(pp_state, stacked)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # untrained-GMM NLL grads are huge (~1e4), so reduction-order noise is
    # amplified vs the l2 tests — tolerance reflects that, not a logic gap
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_state["params"])[0],
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
    got = new_state["normalizer"]["output_normalizer"]["state"]
    exp = ref_norm["output_normalizer"]["state"]
    np.testing.assert_allclose(float(got.acc_count), float(exp.acc_count))
