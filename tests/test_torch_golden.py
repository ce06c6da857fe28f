"""Golden cross-framework parity: pure-torch replicas of the reference
numerics (graphphysics/models/layers.py — build_mlp, RMSNorm, GraphNetBlock's
message passing, the DGL sddmm/softmax/spmm attention with its (N, Dh, H)
layout and 1/sqrt(num_heads) scaling) evaluated with the SAME weights as the
flax implementation. torch_geometric/DGL are not installable here, so the
torch side uses only torch core ops (index_add_ for scatter), following the
reference formulas line by line."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from graphphysics_tpu.models.layers import MLP, Attention, GraphNetBlock, RMSNorm


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def torch_rmsnorm(x, scale, eps=1e-8):
    # reference layers.py:59-74
    norm_x = x.norm(2, dim=-1, keepdim=True)
    rms_x = norm_x * x.shape[-1] ** (-0.5)
    return scale * (x / (rms_x + eps))


def torch_mlp(x, params, layer_norm=True):
    """reference build_mlp (layers.py:99-113): Linear+ReLU x3, Linear,
    optional RMSNorm."""
    n_dense = len([k for k in params if k.startswith("dense")])
    for i in range(n_dense):
        p = params[f"dense_{i}"]
        x = x @ _t(p["kernel"]) + _t(p["bias"])
        if i < n_dense - 1:
            x = torch.relu(x)
    if layer_norm:
        x = torch_rmsnorm(x, _t(params["norm"]["scale"]))
    return x


def test_mlp_golden(rng):
    x = rng.normal(size=(17, 5)).astype(np.float32)
    m = MLP(hidden_size=16, out_size=8)
    params = m.init(jax.random.key(0), jnp.asarray(x))["params"]
    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    golden = torch_mlp(_t(x), params).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_graphnet_block_golden(rng):
    n, e, h = 30, 90, 16
    x = rng.normal(size=(n, h)).astype(np.float32)
    ea = rng.normal(size=(e, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)

    m = GraphNetBlock(hidden_size=h)
    variables = m.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(ea),
        jnp.asarray(senders), jnp.asarray(receivers), None,
    )
    x_new, ea_new = m.apply(
        variables, jnp.asarray(x), jnp.asarray(ea),
        jnp.asarray(senders), jnp.asarray(receivers), None,
    )
    params = variables["params"]

    # reference GraphNetBlock (layers.py:691-746): message =
    # edge_block([edge_attr, x_i(target=receivers), x_j(source=senders)]);
    # aggr = scatter-add to receivers; node update on [x, aggr]; residuals.
    xt, eat = _t(x), _t(ea)
    s, r = torch.tensor(senders, dtype=torch.long), torch.tensor(receivers, dtype=torch.long)
    edge_in = torch.cat([eat, xt[r], xt[s]], dim=-1)
    edge_upd = torch_mlp(edge_in, params["edge_block"])
    aggr = torch.zeros(n, h, dtype=torch.float64).index_add_(0, r, edge_upd)
    node_upd = torch_mlp(torch.cat([xt, aggr], dim=-1), params["node_block"])
    np.testing.assert_allclose(
        np.asarray(x_new), (xt + node_upd).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ea_new), (eat + edge_upd).numpy(), rtol=1e-4, atol=1e-5
    )


def test_attention_golden(rng):
    """Reference sparse attention (layers.py:395-457, 460-545): q/k/v Linear,
    reshape (N, head_dim, num_heads), scores scaled by 1/sqrt(num_heads),
    per-row softmax over the adjacency's stored entries, spmm with v, proj."""
    n, dim, heads = 20, 16, 4
    head_dim = dim // heads
    x = rng.normal(size=(n, dim)).astype(np.float32)
    # symmetric adjacency with self loops so no empty softmax rows
    adj = rng.random((n, n)) > 0.6
    adj = adj | adj.T
    np.fill_diagonal(adj, True)
    senders, receivers = np.nonzero(adj)
    senders = senders.astype(np.int32)
    receivers = receivers.astype(np.int32)

    m = Attention(output_dim=dim, num_heads=heads)
    variables = m.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(senders),
        jnp.asarray(receivers), None,
    )
    ours = np.asarray(
        m.apply(variables, jnp.asarray(x), jnp.asarray(senders),
                jnp.asarray(receivers), None)
    )
    p = variables["params"]

    xt = _t(x)
    q = (xt @ _t(p["q_proj"]["kernel"]) + _t(p["q_proj"]["bias"]))
    k = (xt @ _t(p["k_proj"]["kernel"]) + _t(p["k_proj"]["bias"]))
    v = (xt @ _t(p["v_proj"]["kernel"]) + _t(p["v_proj"]["bias"]))
    # (N, head_dim, num_heads) layout (layers.py:531-533)
    q = q.reshape(n, head_dim, heads)
    k = k.reshape(n, head_dim, heads)
    v = v.reshape(n, head_dim, heads)
    scale = 1.0 / np.sqrt(heads)  # layers.py:411-412 quirk

    out = torch.zeros(n, head_dim, heads, dtype=torch.float64)
    adj_t = torch.tensor(adj)
    for i in range(n):
        nbrs = torch.nonzero(adj_t[i]).flatten()
        scores = torch.einsum("dh,jdh->jh", q[i], k[nbrs]) * scale
        w = torch.softmax(scores, dim=0)  # softmax over stored entries
        out[i] = torch.einsum("jh,jdh->dh", w, v[nbrs])
    out = out.reshape(n, dim)
    golden = out @ _t(p["proj"]["kernel"]) + _t(p["proj"]["bias"])
    np.testing.assert_allclose(ours, golden.numpy(), rtol=1e-4, atol=1e-5)


def test_optimization_trajectory_golden():
    """Step-by-step training-trajectory parity vs pure-torch replicas of
    the reference stack — BOTH model families: EPD (GraphNetBlocks) and the
    sparse transformer (the (N, Dh, H) attention layout, 1/sqrt(H) scaling,
    pre-norm GEGLU blocks) + Simulator normalizers + masked L2 + AdamW +
    cosine-warmup, weights shared via utils.torch_import: 10 steps, f64,
    losses agree to ~1e-9. Runs in a subprocess because JAX_ENABLE_X64 is a
    process-global switch (tests/_torch_traj_parity.py)."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({"JAX_ENABLE_X64": "1", "JAX_PLATFORMS": "cpu"})
    # DROP the TPU tunnel's sitecustomize dir: it imports jax at interpreter
    # startup and pins the axon platform (hangs in wedged-tunnel windows);
    # JAX_PLATFORMS=cpu alone is not enough (CLAUDE.md environment notes)
    keep = [
        q for q in env.get("PYTHONPATH", "").split(os.pathsep)
        if q and ".axon_site" not in q
    ]
    env["PYTHONPATH"] = os.pathsep.join([repo_root] + keep)
    # drop the virtual-device flag: the parity run is single-device
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "_torch_traj_parity.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"trajectory parity failed:\n{proc.stdout}\n{proc.stderr}"
    )
    assert "TRAJ PARITY OK" in proc.stdout
