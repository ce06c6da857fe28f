"""AOT serving export (utils/export.py): the deserialized StableHLO
artifact must reproduce the live eval forward without the model's Python
definitions — the TPU-native replacement for shipping the reference's
predict stack (``graphphysics/predict.py:32-114``)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.utils.export import (
    export_eval_step,
    load_eval_step,
    load_eval_step_file,
    save_eval_step,
)
from tests.conftest import make_test_graph


def _build(num_mixture_components=0):
    g = jax.tree_util.tree_map(jnp.asarray, make_test_graph())
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
        message_passing_num=2,
        node_input_size=cfg.node_input_size,
        edge_input_size=3,
        output_size=2,
        hidden_size=16,
        num_mixture_components=num_mixture_components,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, g
    )
    # accumulate normalizer stats so denormalization is non-trivial
    _, mutated = sim.apply(variables, g, is_training=True, mutable=["normalizer"])
    variables = {"params": variables["params"], "normalizer": mutated["normalizer"]}
    return sim, variables, g


def test_export_roundtrip_matches_live_eval():
    sim, variables, g = _build()
    blob = export_eval_step(sim, variables, g)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    step = load_eval_step(blob)
    got = np.asarray(step(g))
    _, _, want = sim.apply(variables, g, is_training=False)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-6)

    # a different input graph must flow through the baked weights too
    g2 = jax.tree_util.tree_map(jnp.asarray, make_test_graph(seed=5))
    got2 = np.asarray(step(g2))
    _, _, want2 = sim.apply(variables, g2, is_training=False)
    np.testing.assert_allclose(got2, np.asarray(want2), rtol=1e-6, atol=1e-6)
    assert not np.allclose(got, got2)


def test_export_file_roundtrip(tmp_path):
    sim, variables, g = _build()
    path = save_eval_step(str(tmp_path / "serve.stablehlo"), sim, variables, g)
    step = load_eval_step_file(path)
    _, _, want = sim.apply(variables, g, is_training=False)
    np.testing.assert_allclose(
        np.asarray(step(g)), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_export_gmm_takes_sample_key():
    sim, variables, g = _build(num_mixture_components=3)
    blob = export_eval_step(sim, variables, g)
    step = load_eval_step(blob)
    key = jax.random.PRNGKey(42)
    got = np.asarray(step(g, key=key))

    # compare against the JITTED live forward: the exported artifact is the
    # compiled program, and GMM denormalized magnitudes amplify the usual
    # jit-vs-eager fusion noise past tight tolerances
    @jax.jit
    def live(graph, k):
        return sim.apply(
            variables, graph, is_training=False, rngs={"sample": k}
        )[2]

    np.testing.assert_allclose(
        got, np.asarray(live(g, key)), rtol=1e-6, atol=1e-6
    )
    # a different key samples differently
    other = np.asarray(step(g, key=jax.random.PRNGKey(7)))
    assert not np.allclose(got, other)


def test_export_rollout_matches_live():
    from graphphysics_tpu.core.graph import stack_graphs
    from graphphysics_tpu.training.rollout import rollout
    from graphphysics_tpu.utils.export import export_rollout, load_rollout

    sim, variables, _ = _build()
    frames = jax.tree_util.tree_map(
        jnp.asarray, stack_graphs([make_test_graph(seed=s) for s in range(4)])
    )
    blob = export_rollout(sim, variables, frames)
    run = load_rollout(blob)
    key = jax.random.PRNGKey(3)
    pred, tgt = run(frames, key=key)
    assert pred.shape == tgt.shape == (4, frames.x.shape[1], 2)

    live = jax.jit(lambda fr, k: rollout(sim, variables, fr, k))
    lp, lt = live(frames, key)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(lp),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt), np.asarray(lt),
                               rtol=1e-6, atol=1e-6)


def test_export_partitioned_roundtrip_matches_single_device():
    """Multi-device artifact: the edge-partitioned eval forward (halo
    collectives inside the shard_map) exported on a 4-device graph mesh,
    deserialized, and invoked — must match the single-device eval."""
    from graphphysics_tpu.parallel import make_mesh, shard_batch
    from graphphysics_tpu.parallel.graph_partition import (
        partition_graph_halo_np,
        unpartition_rows,
    )
    from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
    from graphphysics_tpu.topology.build import to_undirected
    from graphphysics_tpu.utils.export import (
        export_partitioned_eval_step,
        load_partitioned_eval_step,
    )
    from graphphysics_tpu.core.graph import pad_graph_np

    # symmetric mesh graph divisible into 4 parts
    n = 256
    r = np.random.default_rng(3)
    s = r.integers(0, n, 3 * n).astype(np.int32)
    t = (s + r.integers(1, 16, 3 * n)).astype(np.int32) % n
    S, R = to_undirected(s, t)
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = r.integers(0, 7, n)
    g = pad_graph_np(
        x, r.normal(size=(n, 2)).astype(np.float32), S, R,
        n_pad=n, e_pad=len(S) + 32,
        edge_attr=r.normal(size=(len(S), 3)).astype(np.float32),
        y=r.normal(size=(n, 2)).astype(np.float32), node_type_index=2,
    )
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=16,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, gj)
    _, mutated = sim.apply(
        variables, gj, is_training=True, mutable=["normalizer"]
    )
    variables = {
        "params": variables["params"], "normalizer": mutated["normalizer"]
    }

    parts = partition_graph_halo_np(g, 4)
    mesh = make_mesh(4, (GRAPH_AXIS,))
    blob = export_partitioned_eval_step(sim, variables, parts, mesh)
    assert len(blob) > 0

    step = load_partitioned_eval_step(blob)
    assert step.nr_devices == 4
    placed = shard_batch(
        jax.tree_util.tree_map(jnp.asarray, parts), mesh, GRAPH_AXIS
    )
    got = unpartition_rows(np.asarray(step(placed)))
    _, _, want = sim.apply(variables, gj, is_training=False)
    np.testing.assert_allclose(
        got, np.asarray(want), rtol=2e-4, atol=2e-5
    )
