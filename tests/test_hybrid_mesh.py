"""make_hybrid_mesh: DCN x ICI factored meshes (emulated slices on CPU).

The production layout it encodes: ``data`` split across slices over DCN,
``graph``-axis collectives pinned to ICI (SURVEY.md §2.4 north star).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphphysics_tpu.core.graph import pad_graph_np, stack_graphs
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.parallel import (
    DATA_AXIS,
    GRAPH_AXIS,
    make_dp_graph_parallel_train_step,
    make_hybrid_mesh,
)
from graphphysics_tpu.parallel.graph_partition import partition_graph_np
from graphphysics_tpu.topology.build import to_undirected
from jax.sharding import NamedSharding, PartitionSpec as P


def test_hybrid_mesh_graph_axis_stays_on_ici():
    """With dcn=(2,1) x ici=(2,2) over 8 devices, every graph-axis group
    must lie inside one (emulated, contiguous-id) slice."""
    mesh = make_hybrid_mesh(
        (DATA_AXIS, GRAPH_AXIS), dcn_shape=(2, 1), ici_shape=(2, 2)
    )
    assert mesh.axis_names == (DATA_AXIS, GRAPH_AXIS)
    assert mesh.devices.shape == (4, 2)
    per_slice = 4  # 8 devices / 2 emulated slices
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    # each row = one graph-axis group: single slice
    assert (ids // per_slice == ids[:, :1] // per_slice).all()
    # all 8 devices present exactly once
    assert sorted(ids.ravel().tolist()) == list(range(8))


def test_hybrid_mesh_validates_shapes():
    with pytest.raises(ValueError):
        make_hybrid_mesh((DATA_AXIS,), dcn_shape=(3,), ici_shape=(2,))
    with pytest.raises(ValueError):
        make_hybrid_mesh((DATA_AXIS, GRAPH_AXIS), dcn_shape=(2,), ici_shape=(2, 2))


def test_hybrid_mesh_defaults_single_slice():
    mesh = make_hybrid_mesh((DATA_AXIS,))
    assert mesh.devices.shape == (8,)


def test_2d_step_runs_on_hybrid_mesh():
    """The DP x graph-partition step runs unchanged on a hybrid mesh
    (data across emulated slices, graph axis within-slice)."""

    def mesh_graph(seed):
        n = 64
        r = np.random.default_rng(seed)
        s = r.integers(0, n, 2 * n).astype(np.int32)
        t = (s + r.integers(1, 8, 2 * n)).astype(np.int32) % n
        S, R = to_undirected(s, t)
        x = r.normal(size=(n, 4)).astype(np.float32)
        x[:, 2] = r.integers(0, 7, n)
        pos = r.normal(size=(n, 2)).astype(np.float32)
        ea = r.normal(size=(len(S), 3)).astype(np.float32)
        y = r.normal(size=(n, 2)).astype(np.float32)
        return pad_graph_np(x, pos, S, R, n_pad=n, e_pad=288,
                            edge_attr=ea, y=y, node_type_index=2)

    graphs = [mesh_graph(s) for s in (3, 4)]
    trial = [partition_graph_np(g, 4) for g in graphs]
    eb = max(t.senders.shape[1] for t in trial)
    parts = [partition_graph_np(g, 4, edge_budget_local=eb) for g in graphs]

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=8,
    )
    sim = Simulator(config=cfg, model=model)
    gj0 = jax.tree_util.tree_map(jnp.asarray, graphs[0])
    variables = sim.init({"params": jax.random.key(0)}, gj0)
    tx = optax.sgd(1e-3)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    mesh = make_hybrid_mesh(
        (DATA_AXIS, GRAPH_AXIS), dcn_shape=(2, 1), ici_shape=(1, 4)
    )
    assert mesh.devices.shape == (2, 4)
    step = make_dp_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    batch = jax.tree_util.tree_map(jnp.asarray, stack_graphs(parts))
    sharding = NamedSharding(mesh, P(DATA_AXIS, GRAPH_AXIS))
    batch = jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)
    state, loss1 = step(state, batch)
    state, loss2 = step(state, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
