"""Rollout semantics tests: boundary clamping, autoregressive feedback,
RMSE masking (models the reference rollout state machine tests,
tests/graphphysics/training/test_lightningmodule.py:263-276)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.graph import stack_graphs
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.training.rollout import build_mask, rollout, rollout_rmse
from tests.conftest import make_test_graph


def _sim_and_frames(T=4):
    # one topology + node taxonomy, per-frame dynamic fields (as in a real
    # trajectory: node types are static)
    base = make_test_graph(seed=0)
    rng = np.random.default_rng(42)
    frames = []
    for _ in range(T):
        x = base.x.copy()
        x[:, 0:2] = rng.normal(size=x[:, 0:2].shape).astype(np.float32)
        y = rng.normal(size=base.y.shape).astype(np.float32)
        frames.append(base.replace(x=x, y=y))
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(frames))
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
    g0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    variables = sim.init({"params": jax.random.key(0)}, g0)
    return sim, variables, stacked


def test_build_mask_semantics():
    nt = jnp.array([0, 5, 1, 6, 8], jnp.int32)  # NORMAL, OUTFLOW, OBSTACLE, WALL, PAD
    m = np.asarray(build_mask(nt))
    np.testing.assert_array_equal(m, [False, False, True, True, True])


def test_rollout_shapes_and_boundary_clamping():
    sim, variables, frames = _sim_and_frames()
    preds, targets = rollout(sim, variables, frames, jax.random.key(0))
    T, N = frames.x.shape[0], frames.x.shape[1]
    assert preds.shape == (T, N, 2) and targets.shape == (T, N, 2)
    # boundary (masked) nodes must equal targets at every step
    nt = np.asarray(frames.x[0, :, 2]).astype(int)
    clamped = ~np.isin(nt, [int(NodeType.NORMAL), int(NodeType.OUTFLOW)])
    np.testing.assert_allclose(
        np.asarray(preds)[:, clamped], np.asarray(targets)[:, clamped], rtol=1e-6
    )
    # free nodes must differ (untrained model)
    assert np.abs(np.asarray(preds)[:, ~clamped] - np.asarray(targets)[:, ~clamped]).max() > 1e-4


def test_rollout_feeds_back_predictions():
    """Step t>0 must consume the step t-1 prediction: running the rollout
    with modified later-frame ground-truth outputs must not change the
    prediction at step 1 for free nodes (they are overwritten by feedback)."""
    sim, variables, frames = _sim_and_frames()
    preds1, _ = rollout(sim, variables, frames, jax.random.key(0))

    # corrupt the *input* output-slice of frames 1.. (feedback overwrites it)
    x = np.asarray(frames.x).copy()
    x[1:, :, 0:2] += 123.0
    frames2 = frames.replace(x=jnp.asarray(x))
    preds2, _ = rollout(sim, variables, frames2, jax.random.key(0))

    nt = np.asarray(frames.x[0, :, 2]).astype(int)
    free = np.isin(nt, [int(NodeType.NORMAL), int(NodeType.OUTFLOW)])
    # step 0 identical (same input), step 1 identical on free nodes only if
    # feedback replaced the corrupted slice
    np.testing.assert_allclose(
        np.asarray(preds1)[0][free], np.asarray(preds2)[0][free], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(preds1)[1][free], np.asarray(preds2)[1][free], rtol=1e-4, atol=1e-5
    )


def test_rollout_previous_data_carry():
    sim, variables, frames = _sim_and_frames()
    # use columns 0:2 as "previous data" too (just exercises the carry path)
    preds, targets = rollout(
        sim, variables, frames, jax.random.key(0),
        use_previous_data=True, previous_data_start=0, previous_data_end=2,
    )
    assert preds.shape == targets.shape
    assert bool(jnp.all(jnp.isfinite(preds)))


def test_rollout_rmse_ignores_padding():
    T, N, d = 3, 10, 2
    preds = jnp.ones((T, N, d))
    targets = jnp.zeros((T, N, d))
    mask_all = jnp.ones((N,), bool)
    mask_half = jnp.array([True] * 5 + [False] * 5)
    assert float(rollout_rmse(preds, targets, mask_all)) == 1.0
    assert float(rollout_rmse(preds, targets, mask_half)) == 1.0
    # padding rows with huge error must not leak in
    preds2 = preds.at[:, 5:].set(1e6)
    assert float(rollout_rmse(preds2, targets, mask_half)) == 1.0
