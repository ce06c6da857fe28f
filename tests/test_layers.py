"""Layer and processor tests: shapes, gradient flow, per-step distinctness
(modeled on the reference tests/graphphysics/models/test_layers.py and
test_processors.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphphysics_tpu.models.layers import (
    MLP,
    Attention,
    GatedMLPBlock,
    GraphNetBlock,
    RMSNorm,
    TransformerBlock,
)
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from tests.conftest import make_test_graph


def _graph_cfg():
    g = make_test_graph()
    return g, jnp.array(g.x), jnp.array(g.edge_attr)


def test_rmsnorm_shapes_and_finite(rng):
    x = jnp.array(rng.normal(size=(10, 16)).astype(np.float32))
    m = RMSNorm(dim=16)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_mlp_output_size(rng):
    x = jnp.array(rng.normal(size=(7, 5)).astype(np.float32))
    m = MLP(hidden_size=32, out_size=11)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (7, 11)
    # 4 linear layers by default
    names = set(params["params"].keys())
    assert {"dense_0", "dense_1", "dense_2", "dense_3", "norm"} <= names


def test_gated_mlp_block(rng):
    x = jnp.array(rng.normal(size=(6, 8)).astype(np.float32))
    m = GatedMLPBlock(hidden_size=8, out_size=8)
    params = m.init(jax.random.key(0), x)
    assert m.apply(params, x).shape == (6, 8)


def test_graphnet_block_residual_and_grad():
    g, _, _ = _graph_cfg()
    h = 16
    x = jnp.array(np.random.default_rng(1).normal(size=(g.num_nodes, h)), jnp.float32)
    ea = jnp.array(
        np.random.default_rng(2).normal(size=(g.num_edges, h)), jnp.float32
    )
    m = GraphNetBlock(hidden_size=h)
    s, r, em = jnp.array(g.senders), jnp.array(g.receivers), jnp.array(g.edge_mask)
    params = m.init(jax.random.key(0), x, ea, s, r, em)
    x2, ea2 = m.apply(params, x, ea, s, r, em)
    assert x2.shape == x.shape and ea2.shape == ea.shape

    def loss(p):
        a, b = m.apply(p, x, ea, s, r, em)
        return (a**2).sum() + (b**2).sum()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_graphnet_block_project_before_gather_parity():
    """The opt-in project-before-gather edge MLP is the same function with
    the same param tree: identical outputs and gradients from shared params."""
    g, _, _ = _graph_cfg()
    h = 16
    r0 = np.random.default_rng(3)
    x = jnp.array(r0.normal(size=(g.num_nodes, h)), jnp.float32)
    ea = jnp.array(r0.normal(size=(g.num_edges, h)), jnp.float32)
    s, r, em = jnp.array(g.senders), jnp.array(g.receivers), jnp.array(g.edge_mask)

    base = GraphNetBlock(hidden_size=h)
    fused = GraphNetBlock(hidden_size=h, project_before_gather=True)
    params = base.init(jax.random.key(0), x, ea, s, r, em)
    params_f = fused.init(jax.random.key(0), x, ea, s, r, em)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )

    xb, eb = base.apply(params, x, ea, s, r, em)
    xf, ef = fused.apply(params, x, ea, s, r, em)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xb), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ef), np.asarray(eb), rtol=2e-5, atol=1e-6)

    def loss(m):
        def f(p):
            a, b = m.apply(p, x, ea, s, r, em)
            return (a**2).sum() + (b**2).sum()
        return f

    gb = jax.grad(loss(base))(params)
    gf = jax.grad(loss(fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gb), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("shared_qkv", [True, False])
def test_attention_shapes(shared_qkv):
    g, _, _ = _graph_cfg()
    d = 16
    x = jnp.array(np.random.default_rng(0).normal(size=(g.num_nodes, d)), jnp.float32)
    m = Attention(output_dim=d, num_heads=4, use_separate_proj_weight=not shared_qkv)
    s, r, em = jnp.array(g.senders), jnp.array(g.receivers), jnp.array(g.edge_mask)
    params = m.init(jax.random.key(0), x, s, r, em)
    y = m.apply(params, x, s, r, em)
    assert y.shape == (g.num_nodes, d)


def test_transformer_block_changes_activations():
    g, _, _ = _graph_cfg()
    d = 16
    x = jnp.array(np.random.default_rng(0).normal(size=(g.num_nodes, d)), jnp.float32)
    m = TransformerBlock(output_dim=d, num_heads=4)
    s, r, em = jnp.array(g.senders), jnp.array(g.receivers), jnp.array(g.edge_mask)
    params = m.init(jax.random.key(0), x, s, r, em)
    y = m.apply(params, x, s, r, em)
    assert y.shape == x.shape
    assert float(jnp.abs(y - x).max()) > 1e-4


def test_epd_forward_and_distinct_steps():
    g, x, ea = _graph_cfg()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    model = EncodeProcessDecode(
        message_passing_num=2,
        node_input_size=x.shape[-1],
        edge_input_size=ea.shape[-1],
        output_size=2,
        hidden_size=16,
    )
    params = model.init(jax.random.key(0), gj)
    out = model.apply(params, gj)
    assert out.shape == (g.num_nodes, 2)
    # gradient flows to the first block
    def loss(p):
        return (model.apply(p, gj) ** 2).sum()

    grads = jax.grad(loss)(params)
    b0 = jax.tree_util.tree_leaves(grads["params"]["block_0"])
    assert any(float(jnp.abs(l).max()) > 0 for l in b0)


def test_etd_forward():
    g, x, _ = _graph_cfg()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    model = EncodeTransformDecode(
        message_passing_num=2,
        node_input_size=x.shape[-1],
        output_size=2,
        hidden_size=16,
        num_heads=4,
    )
    params = model.init(jax.random.key(0), gj)
    out = model.apply(params, gj)
    assert out.shape == (g.num_nodes, 2)


def test_epd_gmm_head_output_size():
    g, x, ea = _graph_cfg()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    d, K = 2, 3
    model = EncodeProcessDecode(
        message_passing_num=1,
        node_input_size=x.shape[-1],
        edge_input_size=ea.shape[-1],
        output_size=d,
        hidden_size=16,
        num_mixture_components=K,
    )
    params = model.init(jax.random.key(0), gj)
    out = model.apply(params, gj)
    assert out.shape == (g.num_nodes, K * (2 * d + 1))


def test_only_processor_mode():
    g, x, ea = _graph_cfg()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    # only_processor consumes hidden-width inputs and skips encode/decode
    # (reference processors.py:124-134, used by the MeshMask path)
    h = 16
    gj = gj.replace(
        x=jnp.zeros((g.num_nodes, h)), edge_attr=jnp.zeros((g.num_edges, h))
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=h, edge_input_size=h,
        output_size=2, hidden_size=h, only_processor=True,
    )
    params = model.init(jax.random.key(0), gj)
    out = model.apply(params, gj)
    assert out.shape == (g.num_nodes, h)  # latent width, no decoder
    assert "decode_module" not in params["params"]
    assert "nodes_encoder" not in params["params"]
