"""Optimization-trajectory golden parity vs a pure-torch reference replica.

Run as a SUBPROCESS with ``JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu`` (x64 is a
global jax switch — isolating it keeps the main test process f32).

The strongest end-to-end reference-parity evidence this environment permits
(torch is installed; torch_geometric/DGL/Lightning are not): pure-torch
replicas of the reference training semantics for BOTH model families — the
EPD model (``graphphysics/models/processors.py:27-137``,
``layers.py:630-746``) and the sparse transformer
(``processors.py:140-277``, ``layers.py:395-627``: (N, Dh, H) attention
layout, 1/sqrt(num_heads) scaling, stored-entry softmax, pre-norm GEGLU
blocks),
Simulator normalization + delta targets (``simulator.py:180-307``), masked L2
loss (``utils/loss.py:28-65``), AdamW(wd=1e-4, betas 0.9/0.95) with the
per-step cosine-warmup schedule (``lightning_module.py:275-292``,
``utils/scheduler.py:41-67``) — initialized with IDENTICAL weights exported
through ``utils.torch_import.export_reference_state_dict``, trained for 10
steps on the same batch stream, asserting step-by-step loss agreement in f64.
This covers normalizer running statistics, delta targets, masked loss, and
optimizer/schedule semantics at once.
"""

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

torch.set_default_dtype(torch.float64)

from graphphysics_tpu.core.graph import pad_graph_np
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.training.losses import l2_loss
from graphphysics_tpu.training.schedule import cosine_warmup_schedule
from graphphysics_tpu.topology.build import to_undirected
from graphphysics_tpu.utils.torch_import import export_reference_state_dict

N, HID, MP, STEPS, WARMUP = 192, 16, 2, 10, 3
HEADS = 4
LR, MAX_ITERS = 1e-3, 40
MASKS = (int(NodeType.NORMAL), int(NodeType.OUTFLOW))


def make_graph(seed):
    r = np.random.default_rng(seed)
    s = r.integers(0, N, 3 * N).astype(np.int32)
    t = (s + r.integers(1, 12, 3 * N)).astype(np.int32) % N
    S, R = to_undirected(s, t)
    x = r.normal(size=(N, 4)).astype(np.float32)
    # a mix of loss-mask and clamped node types
    x[:, 2] = r.choice(
        [NodeType.NORMAL, NodeType.OUTFLOW, NodeType.WALL_BOUNDARY], N
    )
    pos = r.normal(size=(N, 2)).astype(np.float32)
    ea = r.normal(size=(len(S), 3)).astype(np.float32)
    y = r.normal(size=(N, 2)).astype(np.float32)
    return pad_graph_np(x, pos, S, R, N, len(S), edge_attr=ea, y=y,
                        node_type_index=2)


# ---------------------------------------------------------------- JAX side

cfg = SimulatorConfig(
    node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
    feature_index_start=0, feature_index_end=2,
    output_index_start=0, output_index_end=2, node_type_index=2,
)
model = EncodeProcessDecode(
    message_passing_num=MP, node_input_size=cfg.node_input_size,
    edge_input_size=3, output_size=2, hidden_size=HID,
)
sim = Simulator(config=cfg, model=model)

graphs = [make_graph(s) for s in range(STEPS)]
g64 = [
    jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            a, jnp.float64 if np.asarray(a).dtype == np.float32 else None
        ),
        g,
    )
    for g in graphs
]

variables = sim.init({"params": jax.random.key(0)}, g64[0])
to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
    lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, t
)
params = to64(variables["params"])
normalizer = to64(variables["normalizer"])

schedule = cosine_warmup_schedule(LR, WARMUP, MAX_ITERS)
tx = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=1e-4)
opt_state = tx.init(params)

jax_losses = []
for g in g64:
    def loss_fn(p):
        (out, tgt, _), mut = sim.apply(
            {"params": p, "normalizer": normalizer}, g,
            is_training=True, mutable=["normalizer"],
        )
        nt = g.x[:, 2].astype(jnp.int32)
        return (
            l2_loss(tgt, out, nt, MASKS, node_valid=g.node_mask),
            mut["normalizer"],
        )

    (loss, normalizer), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    upd, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, upd)
    jax_losses.append(float(loss))


# -------------------------------------------------------------- torch side
# Reference-structured modules so export_reference_state_dict keys load 1:1.

class TorchRMSNorm(torch.nn.Module):
    # reference layers.py:59-74
    def __init__(self, d):
        super().__init__()
        self.scale = torch.nn.Parameter(torch.ones(d))

    def forward(self, x):
        norm_x = x.norm(2, dim=-1, keepdim=True)
        rms_x = norm_x * x.shape[-1] ** (-0.5)
        return self.scale * (x / (rms_x + 1e-8))


def build_mlp(in_size, hidden, out, layer_norm=True, n_dense=4):
    # reference build_mlp layers.py:99-113 as Sequential: Linear at even
    # indices (matching the exporter's `.{2i}.` keys), norm last
    layers = []
    d = in_size
    for i in range(n_dense - 1):
        layers += [torch.nn.Linear(d, hidden), torch.nn.ReLU()]
        d = hidden
    layers += [torch.nn.Linear(d, out)]
    # pad module indices: exporter expects dense i at index 2i
    seq = torch.nn.Sequential(*layers)
    if layer_norm:
        seq.add_module(str(len(layers)), TorchRMSNorm(out))
    return seq


class TorchGraphNetBlock(torch.nn.Module):
    # reference layers.py:630-746
    def __init__(self, hidden):
        super().__init__()
        self.edge_block = build_mlp(3 * hidden, hidden, hidden)
        self.node_block = build_mlp(2 * hidden, hidden, hidden)

    def forward(self, x, ea, senders, receivers):
        edge_in = torch.cat([ea, x[receivers], x[senders]], dim=-1)
        edge_upd = self.edge_block(edge_in)
        aggr = torch.zeros_like(x).index_add_(0, receivers, edge_upd)
        node_upd = self.node_block(torch.cat([x, aggr], dim=-1))
        return x + node_upd, ea + edge_upd


class TorchEPD(torch.nn.Module):
    # reference processors.py:27-137
    def __init__(self, node_in, edge_in, hidden, out, mp):
        super().__init__()
        self.nodes_encoder = build_mlp(node_in, hidden, hidden)
        self.edges_encoder = build_mlp(edge_in, hidden, hidden)
        self.processor_list = torch.nn.ModuleList(
            [TorchGraphNetBlock(hidden) for _ in range(mp)]
        )
        self.decode_module = build_mlp(hidden, hidden, out, layer_norm=False)

    def forward(self, x, ea, senders, receivers):
        x = self.nodes_encoder(x)
        ea = self.edges_encoder(ea)
        for blk in self.processor_list:
            x, ea = blk(x, ea, senders, receivers)
        return self.decode_module(x)


class TorchNormalizer:
    # reference layers.py:265-392 (buffer-mutating running stats)
    def __init__(self, size):
        self.acc_count = 0.0
        self.num_acc = 0.0
        self.acc_sum = torch.zeros(size)
        self.acc_sum_sq = torch.zeros(size)

    def __call__(self, data, accumulate=True):
        if accumulate and self.num_acc < 10**5:
            self.acc_count += data.shape[0]
            self.num_acc += 1.0
            self.acc_sum += data.sum(0).detach()
            self.acc_sum_sq += (data**2).sum(0).detach()
        cnt = max(self.acc_count, 1.0)
        mean = self.acc_sum / cnt
        std = torch.clamp(self.acc_sum_sq / cnt - mean**2, min=0.0).sqrt()
        std = torch.clamp(std, min=1e-8)
        return (data - mean) / std


tmodel = TorchEPD(cfg.node_input_size, 3, HID, 2, MP)
sd = {
    k.removeprefix("model."): torch.tensor(v)
    for k, v in export_reference_state_dict(variables["params"]).items()
}
missing, unexpected = tmodel.load_state_dict(sd, strict=True), None
out_norm = TorchNormalizer(2)
node_norm = TorchNormalizer(cfg.node_input_size)
edge_norm = TorchNormalizer(3)

opt = torch.optim.AdamW(
    tmodel.parameters(), lr=LR, betas=(0.9, 0.95), weight_decay=1e-4
)


def lr_factor(step):
    # reference scheduler.py:41-67 / our schedule.py (epoch = step + 1)
    epoch = min(step + 1.0, float(MAX_ITERS))
    f = 0.5 * (1.0 + np.cos(np.pi * epoch / MAX_ITERS))
    if epoch <= WARMUP:
        f *= epoch / WARMUP
    return max(f, 1e-3)


torch_losses = []
for step_i, g in enumerate(graphs):
    x = torch.tensor(np.asarray(g.x), dtype=torch.float64)
    ea = torch.tensor(np.asarray(g.edge_attr), dtype=torch.float64)
    y = torch.tensor(np.asarray(g.y), dtype=torch.float64)
    senders = torch.tensor(np.asarray(g.senders), dtype=torch.long)
    receivers = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    node_type = torch.tensor(np.asarray(g.x)[:, 2], dtype=torch.long)

    pre_target = x[:, 0:2]
    tgt_norm = out_norm(y - pre_target)
    one_hot = torch.nn.functional.one_hot(node_type, NodeType.SIZE).to(x.dtype)
    feats = node_norm(torch.cat([x[:, 0:2], one_hot], dim=-1))
    ea_n = edge_norm(ea)

    out = tmodel(feats, ea_n, senders, receivers)
    mask = torch.zeros_like(node_type, dtype=torch.bool)
    for t in MASKS:
        mask |= node_type == t
    per_row = ((out - tgt_norm) ** 2).mean(-1)
    loss = (per_row * mask).sum() / mask.sum().clamp(min=1)

    for gparam in opt.param_groups:
        gparam["lr"] = LR * lr_factor(step_i)
    opt.zero_grad()
    loss.backward()
    opt.step()
    torch_losses.append(float(loss.detach()))


print("EPD jax  :", ["%.8f" % l for l in jax_losses])
print("EPD torch:", ["%.8f" % l for l in torch_losses])
diff = np.abs(np.asarray(jax_losses) - np.asarray(torch_losses))
rel = diff / np.abs(np.asarray(torch_losses))
print("EPD max rel diff:", rel.max())
# f64 end-to-end: only the f32 weight initialization is shared, everything
# else should agree to ~1e-9; allow 1e-7 for platform libm differences
assert rel.max() < 1e-7, f"EPD step-by-step loss divergence: {rel}"


# ----------------------------------------------- transformer family (ETD)
# Covers the attention path end-to-end: the (N, Dh, H) reshape layout and
# 1/sqrt(num_heads) scaling (reference layers.py:411-412, 525-533), sparse
# softmax over the adjacency's stored entries, pre-norm residual blocks,
# GEGLU gated MLP — through 10 optimization steps.

t_cfg = SimulatorConfig(
    node_input_size=2 + NodeType.SIZE, edge_input_size=0, output_size=2,
    feature_index_start=0, feature_index_end=2,
    output_index_start=0, output_index_end=2, node_type_index=2,
)
t_model = EncodeTransformDecode(
    message_passing_num=MP, node_input_size=t_cfg.node_input_size,
    output_size=2, hidden_size=HID, num_heads=HEADS,
)
t_sim = Simulator(config=t_cfg, model=t_model)
t_variables = t_sim.init({"params": jax.random.key(1)}, g64[0])
t_params = to64(t_variables["params"])
t_norm = to64(t_variables["normalizer"])
t_opt = tx.init(t_params)

tf_jax_losses = []
for g in g64:
    def loss_fn(p, g=g):
        (out, tgt, _), mut = t_sim.apply(
            {"params": p, "normalizer": t_norm}, g,
            is_training=True, mutable=["normalizer"],
        )
        nt = g.x[:, 2].astype(jnp.int32)
        return (
            l2_loss(tgt, out, nt, MASKS, node_valid=g.node_mask),
            mut["normalizer"],
        )

    (loss, t_norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        t_params
    )
    upd, t_opt = tx.update(grads, t_opt, t_params)
    t_params = optax.apply_updates(t_params, upd)
    tf_jax_losses.append(float(loss))


class TorchGatedMLP(torch.nn.Module):
    # reference GEGLU layers.py:198-233
    def __init__(self, hidden, expansion=3):
        super().__init__()
        self.linear1 = torch.nn.Linear(hidden, expansion * hidden)
        self.linear2 = torch.nn.Linear(hidden, expansion * hidden)

    def forward(self, x):
        return torch.nn.functional.gelu(self.linear1(x)) * self.linear2(x)


class TorchAttention(torch.nn.Module):
    # reference layers.py:395-457, 460-545: (N, Dh, H) layout, 1/sqrt(H)
    # scaling, softmax over each sender's stored adjacency entries
    def __init__(self, dim, heads):
        super().__init__()
        self.q_proj = torch.nn.Linear(dim, dim)
        self.k_proj = torch.nn.Linear(dim, dim)
        self.v_proj = torch.nn.Linear(dim, dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.dim, self.heads = dim, heads

    def forward(self, x, senders, receivers):
        n, dh = x.shape[0], self.dim // self.heads
        q = self.q_proj(x).reshape(n, dh, self.heads)
        k = self.k_proj(x).reshape(n, dh, self.heads)
        v = self.v_proj(x).reshape(n, dh, self.heads)
        scores = (q[senders] * k[receivers]).sum(1) / np.sqrt(self.heads)
        seg_max = torch.full((n, self.heads), -torch.inf).index_reduce_(
            0, senders, scores, "amax", include_self=False
        )
        p = torch.exp(scores - seg_max[senders])
        denom = torch.zeros(n, self.heads).index_add_(0, senders, p)
        w = p / denom[senders]  # [E, H]
        out = torch.zeros(n, dh, self.heads).index_add_(
            0, senders, v[receivers] * w[:, None, :]
        )
        return self.proj(out.reshape(n, self.dim))


class TorchTransformerBlock(torch.nn.Module):
    # pre-norm residual block layers.py:548-627
    def __init__(self, dim, heads):
        super().__init__()
        self.attention = TorchAttention(dim, heads)
        self.norm1 = TorchRMSNorm(dim)
        self.norm2 = TorchRMSNorm(dim)
        self.gated_mlp = torch.nn.Sequential(
            TorchRMSNorm(dim), TorchGatedMLP(dim),
            torch.nn.Linear(3 * dim, dim),
        )

    def forward(self, x, senders, receivers):
        x = x + self.attention(self.norm1(x), senders, receivers)
        return x + self.gated_mlp(self.norm2(x))


class TorchETD(torch.nn.Module):
    def __init__(self, node_in, hidden, out, mp, heads):
        super().__init__()
        self.nodes_encoder = build_mlp(node_in, hidden, hidden)
        self.processor_list = torch.nn.ModuleList(
            [TorchTransformerBlock(hidden, heads) for _ in range(mp)]
        )
        self.decode_module = build_mlp(hidden, hidden, out, layer_norm=False)

    def forward(self, x, senders, receivers):
        x = self.nodes_encoder(x)
        for blk in self.processor_list:
            x = blk(x, senders, receivers)
        return self.decode_module(x)


tt_model = TorchETD(t_cfg.node_input_size, HID, 2, MP, HEADS)
tt_sd = {
    k.removeprefix("model."): torch.tensor(v)
    for k, v in export_reference_state_dict(t_variables["params"]).items()
}
tt_model.load_state_dict(tt_sd, strict=True)
t_out_norm = TorchNormalizer(2)
t_node_norm = TorchNormalizer(t_cfg.node_input_size)
t_torch_opt = torch.optim.AdamW(
    tt_model.parameters(), lr=LR, betas=(0.9, 0.95), weight_decay=1e-4
)

tf_torch_losses = []
for step_i, g in enumerate(graphs):
    x = torch.tensor(np.asarray(g.x), dtype=torch.float64)
    y = torch.tensor(np.asarray(g.y), dtype=torch.float64)
    senders = torch.tensor(np.asarray(g.senders), dtype=torch.long)
    receivers = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    node_type = torch.tensor(np.asarray(g.x)[:, 2], dtype=torch.long)

    pre_target = x[:, 0:2]
    tgt_norm = t_out_norm(y - pre_target)
    one_hot = torch.nn.functional.one_hot(node_type, NodeType.SIZE).to(x.dtype)
    feats = t_node_norm(torch.cat([x[:, 0:2], one_hot], dim=-1))

    out = tt_model(feats, senders, receivers)
    mask = torch.zeros_like(node_type, dtype=torch.bool)
    for t in MASKS:
        mask |= node_type == t
    per_row = ((out - tgt_norm) ** 2).mean(-1)
    loss = (per_row * mask).sum() / mask.sum().clamp(min=1)

    for gparam in t_torch_opt.param_groups:
        gparam["lr"] = LR * lr_factor(step_i)
    t_torch_opt.zero_grad()
    loss.backward()
    t_torch_opt.step()
    tf_torch_losses.append(float(loss.detach()))

print("ETD jax  :", ["%.8f" % l for l in tf_jax_losses])
print("ETD torch:", ["%.8f" % l for l in tf_torch_losses])
tf_rel = np.abs(
    np.asarray(tf_jax_losses) - np.asarray(tf_torch_losses)
) / np.abs(np.asarray(tf_torch_losses))
print("ETD max rel diff:", tf_rel.max())
assert tf_rel.max() < 1e-7, f"ETD step-by-step loss divergence: {tf_rel}"
print("TRAJ PARITY OK")
