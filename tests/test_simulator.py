"""Simulator tests: feature assembly, normalizer mutation, delta decode, GMM."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from tests.conftest import make_test_graph


def _build(num_mixture_components=0, use_diagonal=True, temperature=1.0):
    g = make_test_graph()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
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
        hidden_size=16,
        num_mixture_components=num_mixture_components,
        use_diagonal=use_diagonal,
        temperature=temperature,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, gj
    )
    return sim, variables, gj


def test_training_forward_mutates_normalizers():
    sim, variables, gj = _build()
    (out, target_dn, extra), mutated = sim.apply(
        variables, gj, is_training=True, mutable=["normalizer"]
    )
    assert extra is None
    assert out.shape == (gj.num_nodes, 2)
    assert target_dn.shape == (gj.num_nodes, 2)
    node_state = mutated["normalizer"]["node_normalizer"]["state"]
    assert float(node_state.acc_count) > 0
    # only real (non-padding) nodes counted
    assert float(node_state.acc_count) == float(jnp.sum(gj.node_mask))


def test_eval_outputs_are_pretarget_plus_inverse_update():
    sim, variables, gj = _build()
    # accumulate some stats first
    _, mutated = sim.apply(variables, gj, is_training=True, mutable=["normalizer"])
    variables = {**variables, "normalizer": mutated["normalizer"]}
    (out, _, outputs), _ = sim.apply(
        variables, gj, is_training=False, mutable=[]
    )
    from graphphysics_tpu.core import normalizer as norm

    state = variables["normalizer"]["output_normalizer"]["state"]
    pre_target = gj.x[:, 0:2]
    expected = pre_target + norm.inverse(state, out)
    np.testing.assert_allclose(
        np.asarray(outputs), np.asarray(expected), rtol=1e-4, atol=1e-5
    )


def test_eval_gmm_sampling_shapes():
    sim, variables, gj = _build(num_mixture_components=3)
    (_, _, outputs), _ = sim.apply(
        variables,
        gj,
        is_training=False,
        mutable=[],
        rngs={"sample": jax.random.key(7)},
    )
    assert outputs.shape == (gj.num_nodes, 2)
    assert bool(jnp.all(jnp.isfinite(outputs)))


def test_eval_full_covariance_gmm_sampling():
    """use_diagonal=False must route through the full-covariance sampler
    (the head emits K*(1 + d + d(d+1)/2) columns, not K*(2d+1))."""
    sim, variables, gj = _build(num_mixture_components=2, use_diagonal=False)
    (raw, _, outputs), _ = sim.apply(
        variables, gj, is_training=False, mutable=[],
        rngs={"sample": jax.random.key(3)},
    )
    assert raw.shape == (gj.num_nodes, 2 * (1 + 2 + 3))
    assert outputs.shape == (gj.num_nodes, 2)
    assert bool(jnp.all(jnp.isfinite(outputs)))


def test_eval_gmm_temperature_zero_is_deterministic():
    """temperature=0.0 is a valid config (deterministic component means) and
    must not be silently replaced by 1.0."""
    sim, variables, gj = _build(num_mixture_components=2, temperature=0.0)
    (_, _, a), _ = sim.apply(variables, gj, is_training=False, mutable=[],
                             rngs={"sample": jax.random.key(1)})
    (_, _, b), _ = sim.apply(variables, gj, is_training=False, mutable=[],
                             rngs={"sample": jax.random.key(2)})
    # zero temperature: no sampling noise -> identical outputs across keys
    # (component CHOICE is still random, but with shared pre_proj init the
    # mixture means dominate; require near-equality of the noise part)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_target_delta_semantics():
    sim, variables, gj = _build()
    (_, target_dn, _), mutated = sim.apply(
        variables, gj, is_training=True, mutable=["normalizer"]
    )
    from graphphysics_tpu.core import normalizer as norm

    state = mutated["normalizer"]["output_normalizer"]["state"]
    delta = gj.y - gj.x[:, 0:2]
    expected = (delta - norm.mean(state)) / norm.std_with_epsilon(state)
    np.testing.assert_allclose(
        np.asarray(target_dn), np.asarray(expected), rtol=1e-4, atol=1e-5
    )
