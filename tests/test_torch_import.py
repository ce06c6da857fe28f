"""Reference-checkpoint import/export parity.

Builds torch ``nn.Module`` replicas with the reference's exact module
attribute tree (``graphphysics/models/processors.py:27-277`` /
``layers.py:77-262``) — so their ``state_dict()`` keys are byte-identical to a
real reference checkpoint — then imports those weights with
``utils.torch_import`` and checks our forward equals the torch forward.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.utils.torch_import import (
    export_reference_checkpoint,
    import_reference_checkpoint,
    import_reference_state_dict,
)


# --------------------------------------------------------------------------
# torch replicas of the reference module tree (same attribute names =>
# same state_dict keys). Formulas follow the reference line by line.
# --------------------------------------------------------------------------


class TorchRMSNorm(tnn.Module):
    def __init__(self, d, eps=1e-8):
        super().__init__()
        self.d, self.eps = d, eps
        self.scale = tnn.Parameter(torch.ones(d))

    def forward(self, x):
        rms = x.norm(2, dim=-1, keepdim=True) * self.d ** (-0.5)
        return self.scale * (x / (rms + self.eps))


def torch_build_mlp(in_size, hidden, out, layer_norm=True):
    layers = [tnn.Linear(in_size, hidden), tnn.ReLU()]
    for _ in range(2):
        layers += [tnn.Linear(hidden, hidden), tnn.ReLU()]
    layers.append(tnn.Linear(hidden, out))
    if layer_norm:
        layers.append(TorchRMSNorm(out))
    return tnn.Sequential(*layers)


class TorchGatedMLP(tnn.Module):
    def __init__(self, in_size, hidden, expansion=3):
        super().__init__()
        self.linear1 = tnn.Linear(in_size, expansion * hidden)
        self.linear2 = tnn.Linear(in_size, expansion * hidden)

    def forward(self, x):
        return torch.nn.functional.gelu(self.linear1(x)) * self.linear2(x)


def torch_build_gated_mlp(in_size, hidden, out, expansion=3):
    return tnn.Sequential(
        TorchRMSNorm(in_size),
        TorchGatedMLP(in_size, hidden, expansion),
        tnn.Linear(hidden * expansion, out),
    )


class TorchGraphNetBlock(tnn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.edge_block = torch_build_mlp(3 * hidden, hidden, hidden)
        self.node_block = torch_build_mlp(2 * hidden, hidden, hidden)

    def forward(self, x, senders, receivers, edge_attr):
        edge_in = torch.cat([edge_attr, x[receivers], x[senders]], dim=-1)
        edge_upd = self.edge_block(edge_in)
        aggr = torch.zeros_like(x).index_add_(0, receivers, edge_upd)
        node_upd = self.node_block(torch.cat([x, aggr], dim=-1))
        return x + node_upd, edge_attr + edge_upd


class TorchEPD(tnn.Module):
    """Attribute tree of reference EncodeProcessDecode (processors.py:27-137)."""

    def __init__(self, steps, node_in, edge_in, out, hidden):
        super().__init__()
        self.nodes_encoder = torch_build_mlp(node_in, hidden, hidden)
        self.edges_encoder = torch_build_mlp(edge_in, hidden, hidden)
        self.decode_module = torch_build_mlp(hidden, hidden, out, layer_norm=False)
        self.processor_list = tnn.ModuleList(
            [TorchGraphNetBlock(hidden) for _ in range(steps)]
        )

    def forward(self, x, senders, receivers, edge_attr):
        x = self.nodes_encoder(x)
        edge_attr = self.edges_encoder(edge_attr)
        for block in self.processor_list:
            x, edge_attr = block(x, senders, receivers, edge_attr)
        return self.decode_module(x)


class TorchAttention(tnn.Module):
    def __init__(self, dim, heads, use_separate_proj_weight=True):
        super().__init__()
        self.num_heads, self.head_dim = heads, dim // heads
        self.q_proj = tnn.Linear(dim, dim)
        self.k_proj = tnn.Linear(dim, dim)
        self.v_proj = tnn.Linear(dim, dim)
        self.proj = tnn.Linear(dim, dim)
        if not use_separate_proj_weight:
            with torch.no_grad():
                self.k_proj.weight = self.q_proj.weight
                self.v_proj.weight = self.q_proj.weight

    def forward(self, x, adj):
        n = x.shape[0]
        q = self.q_proj(x).reshape(n, self.head_dim, self.num_heads)
        k = self.k_proj(x).reshape(n, self.head_dim, self.num_heads)
        v = self.v_proj(x).reshape(n, self.head_dim, self.num_heads)
        scale = 1.0 / math.sqrt(self.num_heads)  # layers.py:411-412 quirk
        out = torch.zeros_like(q)
        for i in range(n):
            nbrs = torch.nonzero(adj[i]).flatten()
            scores = torch.einsum("dh,jdh->jh", q[i], k[nbrs]) * scale
            w = torch.softmax(scores, dim=0)
            out[i] = torch.einsum("jh,jdh->dh", w, v[nbrs])
        return self.proj(out.reshape(n, -1))


class TorchTransformer(tnn.Module):
    def __init__(self, dim, heads, use_separate_proj_weight=True):
        super().__init__()
        self.attention = TorchAttention(dim, heads, use_separate_proj_weight)
        self.norm1, self.norm2 = TorchRMSNorm(dim), TorchRMSNorm(dim)
        self.gated_mlp = torch_build_gated_mlp(dim, dim, dim)

    def forward(self, x, adj):
        x = x + self.attention(self.norm1(x), adj)
        return x + self.gated_mlp(self.norm2(x))


class TorchETD(tnn.Module):
    """Attribute tree of reference EncodeTransformDecode (processors.py:140-277)."""

    def __init__(self, steps, node_in, out, hidden, heads,
                 use_separate_proj_weight=True):
        super().__init__()
        self.nodes_encoder = torch_build_mlp(node_in, hidden, hidden)
        self.decode_module = torch_build_mlp(hidden, hidden, out, layer_norm=False)
        self.processor_list = tnn.ModuleList(
            [TorchTransformer(hidden, heads, use_separate_proj_weight)
             for _ in range(steps)]
        )

    def forward(self, x, adj):
        x = self.nodes_encoder(x)
        for block in self.processor_list:
            x = block(x, adj)
        return self.decode_module(x)


# --------------------------------------------------------------------------


def _graph(rng, n, e, node_in, edge_in):
    x = rng.normal(size=(n, node_in)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    ea = rng.normal(size=(e, edge_in)).astype(np.float32) if edge_in else None
    return Graph(
        x=jnp.asarray(x),
        pos=jnp.zeros((n, 2), jnp.float32),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_attr=jnp.asarray(ea) if ea is not None else None,
        node_mask=jnp.ones((n,), bool),
        edge_mask=jnp.ones((e,), bool),
        y=None,
    ), x, senders, receivers, ea


def test_epd_state_dict_import_forward_parity(rng):
    n, e, hidden = 24, 80, 16
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=5, edge_input_size=3,
        output_size=2, hidden_size=hidden,
    )
    graph, x, s, r, ea = _graph(rng, n, e, 5, 3)
    template = model.init(jax.random.key(0), graph)["params"]

    torch_model = TorchEPD(2, 5, 3, 2, hidden).double()
    sd = {f"model.{k}": v for k, v in torch_model.state_dict().items()}
    params = import_reference_state_dict(sd, {"model": template})["model"]

    ours = np.asarray(model.apply({"params": params}, graph))
    with torch.no_grad():
        golden = torch_model(
            torch.tensor(x, dtype=torch.float64),
            torch.tensor(s, dtype=torch.long),
            torch.tensor(r, dtype=torch.long),
            torch.tensor(ea, dtype=torch.float64),
        ).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("separate", [True, False])
def test_etd_state_dict_import_forward_parity(rng, separate):
    n, hidden, heads = 18, 16, 4
    adj = rng.random((n, n)) > 0.6
    adj = adj | adj.T
    np.fill_diagonal(adj, True)
    s, r = np.nonzero(adj)
    e = len(s)

    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=5, output_size=2,
        hidden_size=hidden, num_heads=heads, use_separate_proj_weight=separate,
    )
    graph, x, _, _, _ = _graph(rng, n, e, 5, 0)
    graph = Graph(
        x=graph.x, pos=graph.pos,
        senders=jnp.asarray(s.astype(np.int32)),
        receivers=jnp.asarray(r.astype(np.int32)),
        edge_attr=None, node_mask=graph.node_mask,
        edge_mask=jnp.ones((e,), bool), y=None,
    )
    template = model.init(jax.random.key(0), graph)["params"]

    torch_model = TorchETD(2, 5, 2, hidden, heads,
                           use_separate_proj_weight=separate).double()
    if not separate:
        # mimic independently-trained biases on the shared-weight projections
        with torch.no_grad():
            torch_model.processor_list[0].attention.k_proj.bias.add_(0.3)
            torch_model.processor_list[1].attention.v_proj.bias.add_(-0.2)
    sd = {f"model.{k}": v for k, v in torch_model.state_dict().items()}
    params = import_reference_state_dict(sd, {"model": template})["model"]

    ours = np.asarray(model.apply({"params": params}, graph))
    with torch.no_grad():
        golden = torch_model(
            torch.tensor(x, dtype=torch.float64), torch.tensor(adj)
        ).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_separate_weights_into_shared_model_raises(rng):
    """A checkpoint trained with distinct q/k/v weights must NOT silently
    import into a shared-qkv model."""
    n, hidden, heads = 10, 8, 2
    adj = np.eye(n, dtype=bool) | (rng.random((n, n)) > 0.5)
    adj = adj | adj.T
    s, r = np.nonzero(adj)

    model = EncodeTransformDecode(
        message_passing_num=1, node_input_size=5, output_size=2,
        hidden_size=hidden, num_heads=heads, use_separate_proj_weight=False,
    )
    graph, _, _, _, _ = _graph(rng, n, len(s), 5, 0)
    graph = Graph(
        x=graph.x, pos=graph.pos,
        senders=jnp.asarray(s.astype(np.int32)),
        receivers=jnp.asarray(r.astype(np.int32)),
        edge_attr=None, node_mask=graph.node_mask,
        edge_mask=jnp.ones((len(s),), bool), y=None,
    )
    template = model.init(jax.random.key(0), graph)["params"]

    torch_model = TorchETD(1, 5, 2, hidden, heads, use_separate_proj_weight=True)
    sd = {f"model.{k}": v for k, v in torch_model.state_dict().items()}
    with pytest.raises(ValueError, match="separate q/k/v"):
        import_reference_state_dict(sd, {"model": template})


def test_simulator_checkpoint_import_and_roundtrip(rng):
    """Full reference-format checkpoint (model + normalizer dicts) ->
    Simulator variables; then export -> import round-trips exactly."""
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig

    n, e = 20, 60
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

    xr = rng.normal(size=(n, 4)).astype(np.float32)
    xr[:, 2] = rng.integers(0, 7, n)
    graph = Graph(
        x=jnp.asarray(xr), pos=jnp.zeros((n, 2), jnp.float32),
        senders=jnp.asarray(rng.integers(0, n, e).astype(np.int32)),
        receivers=jnp.asarray(rng.integers(0, n, e).astype(np.int32)),
        edge_attr=jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32)),
        node_mask=jnp.ones((n,), bool), edge_mask=jnp.ones((e,), bool),
        y=jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32)),
    )
    variables = sim.init({"params": jax.random.key(0)}, graph)

    torch_model = TorchEPD(1, cfg.node_input_size, 3, 2, 8)
    ckpt = {
        "model": {f"model.{k}": v for k, v in torch_model.state_dict().items()},
        "_output_normalizer": {
            "_acc_count": torch.tensor(10.0),
            "_num_accumulations": torch.tensor(2.0),
            "_acc_sum": torch.arange(2, dtype=torch.float32) + 1,
            "_acc_sum_squared": torch.arange(2, dtype=torch.float32) + 5,
        },
        "_node_normalizer": {
            "_acc_count": torch.tensor(4.0),
            "_num_accumulations": torch.tensor(1.0),
            "_acc_sum": torch.zeros(cfg.node_input_size),
            "_acc_sum_squared": torch.ones(cfg.node_input_size),
        },
        "_edge_normalizer": {
            "_acc_count": torch.tensor(7.0),
            "_num_accumulations": torch.tensor(3.0),
            "_acc_sum": torch.ones(3),
            "_acc_sum_squared": torch.ones(3) * 2,
        },
    }
    imported = import_reference_checkpoint(ckpt, variables)

    st = imported["normalizer"]["output_normalizer"]["state"]
    assert float(st.acc_count) == 10.0
    np.testing.assert_allclose(np.asarray(st.acc_sum), [1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(imported["normalizer"]["edge_normalizer"]["state"].acc_sum_sq),
        [2.0, 2.0, 2.0],
    )
    # weights actually landed (not the init values)
    np.testing.assert_allclose(
        np.asarray(imported["params"]["model"]["nodes_encoder"]["dense_0"]["kernel"]),
        torch_model.nodes_encoder[0].weight.detach().numpy().T,
        rtol=1e-6,
    )

    # export -> import round-trip is exact
    exported = export_reference_checkpoint(imported)
    again = import_reference_checkpoint(exported, variables)
    for a, b in zip(
        jax.tree_util.tree_leaves(imported), jax.tree_util.tree_leaves(again)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # the model runs with imported weights
    (out, tgt, _), _ = sim.apply(
        imported, graph, is_training=True, mutable=["normalizer"]
    )
    assert np.isfinite(np.asarray(out)).all()


def test_load_checkpoint_autodetects_torch_file(rng, tmp_path):
    """training.checkpoint.load_checkpoint transparently imports a reference
    ``torch.save`` file: params + normalizer from the file, fresh opt state."""
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.training.checkpoint import (
        is_torch_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    n, e = 16, 40
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
    xr = rng.normal(size=(n, 4)).astype(np.float32)
    xr[:, 2] = rng.integers(0, 7, n)
    graph = Graph(
        x=jnp.asarray(xr), pos=jnp.zeros((n, 2), jnp.float32),
        senders=jnp.asarray(rng.integers(0, n, e).astype(np.int32)),
        receivers=jnp.asarray(rng.integers(0, n, e).astype(np.int32)),
        edge_attr=jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32)),
        node_mask=jnp.ones((n,), bool), edge_mask=jnp.ones((e,), bool),
        y=jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32)),
    )
    variables = sim.init({"params": jax.random.key(0)}, graph)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "step": jnp.zeros((), jnp.int32),
    }

    torch_model = TorchEPD(1, cfg.node_input_size, 3, 2, 8)
    torch_path = str(tmp_path / "reference.ckpt")
    torch.save(
        {
            "model": {f"model.{k}": v for k, v in torch_model.state_dict().items()},
            "_output_normalizer": {
                "_acc_count": torch.tensor(3.0),
                "_num_accumulations": torch.tensor(1.0),
                "_acc_sum": torch.ones(2),
                "_acc_sum_squared": torch.ones(2),
            },
            "_node_normalizer": {
                "_acc_count": torch.tensor(3.0),
                "_num_accumulations": torch.tensor(1.0),
                "_acc_sum": torch.zeros(cfg.node_input_size),
                "_acc_sum_squared": torch.ones(cfg.node_input_size),
            },
            "_edge_normalizer": None,
        },
        torch_path,
    )
    ours_path = str(tmp_path / "ours.ckpt")
    save_checkpoint(ours_path, state)

    assert is_torch_checkpoint(torch_path)
    assert not is_torch_checkpoint(ours_path)

    loaded = load_checkpoint(torch_path, state)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["model"]["nodes_encoder"]["dense_0"]["kernel"]),
        torch_model.nodes_encoder[0].weight.detach().numpy().T,
        rtol=1e-6,
    )
    assert float(loaded["normalizer"]["output_normalizer"]["state"].acc_count) == 3.0
    assert int(loaded["step"]) == 0  # fresh optimizer/step state

    # our own format still round-trips
    loaded2 = load_checkpoint(ours_path, state)
    assert int(loaded2["step"]) == 0


def test_gmm_head_import(rng):
    n, e, hidden, K, d = 12, 30, 8, 3, 2
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=5, edge_input_size=3,
        output_size=d, hidden_size=hidden, num_mixture_components=K,
    )
    graph, x, s, r, ea = _graph(rng, n, e, 5, 3)
    template = model.init(jax.random.key(0), graph)["params"]

    class TorchDiagGMMHead(tnn.Module):
        def __init__(self, input_dim, d, K):
            super().__init__()
            self.pre_proj = tnn.Linear(input_dim, input_dim)
            self.proj = tnn.Linear(input_dim, K * (2 * d + 1))

        def forward(self, x):
            return self.proj(self.pre_proj(x))

    class TorchEPDGMM(tnn.Module):
        def __init__(self):
            super().__init__()
            self.nodes_encoder = torch_build_mlp(5, hidden, hidden)
            self.edges_encoder = torch_build_mlp(3, hidden, hidden)
            self.decode_module = TorchDiagGMMHead(hidden, d, K)
            self.processor_list = tnn.ModuleList([TorchGraphNetBlock(hidden)])

        def forward(self, x, senders, receivers, edge_attr):
            x = self.nodes_encoder(x)
            edge_attr = self.edges_encoder(edge_attr)
            for block in self.processor_list:
                x, edge_attr = block(x, senders, receivers, edge_attr)
            return self.decode_module(x)

    torch_model = TorchEPDGMM().double()
    sd = {f"model.{k}": v for k, v in torch_model.state_dict().items()}
    params = import_reference_state_dict(sd, {"model": template})["model"]

    ours = np.asarray(model.apply({"params": params}, graph))
    with torch.no_grad():
        golden = torch_model(
            torch.tensor(x, dtype=torch.float64),
            torch.tensor(s, dtype=torch.long),
            torch.tensor(r, dtype=torch.long),
            torch.tensor(ea, dtype=torch.float64),
        ).numpy()
    assert ours.shape == (n, K * (2 * d + 1))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_bf16_reference_tensors_import(rng):
    """Checkpoints saved from bf16-true reference training import: .numpy()
    has no bfloat16 counterpart, so floats upcast before the conversion."""
    from graphphysics_tpu.utils.torch_import import _to_np

    t = torch.ones(3, 2, dtype=torch.bfloat16) * 1.5
    out = _to_np(t)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 1.5)
    # int tensors (step counters etc.) still convert
    assert _to_np(torch.arange(4)).dtype == np.float32
