"""Informational benchmark suite over the reference's workload families
(BASELINE.md): run with ``python benchmarks/workloads.py [name ...]``.

Measures honest chained-step wall time (see utils/profiling) for:
- ``cylinder``: EPD 15x128, 8x(2048n/12288e) — the headline metric
- ``plate``: transformer 10x64 with 8-dim edge features disabled (edge_input 0)
- ``panels``: transformer 15x128
- ``aneurysm``: transformer 10x64 on a single large 3D graph (~66k nodes)

Prints one JSON line per workload; bench.py remains the driver's single-line
entry point.
"""

import json
import sys
import time

import numpy as np


def build_graph(n, e, node_features, edge_features, output_size, batch, seed=0,
                layout="coo"):
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.core.graph import (
        concat_graphs,
        pad_graph_csr_np,
        pad_graph_np,
    )

    pad = pad_graph_csr_np if layout == "csr" else pad_graph_np

    def one(s):
        r = np.random.default_rng(s)
        x = r.normal(size=(n, node_features)).astype(np.float32)
        x[:, node_features - 2] = r.integers(0, 7, size=n)
        ea = (
            r.normal(size=(e, edge_features)).astype(np.float32)
            if edge_features
            else None
        )
        return pad(
            x,
            r.normal(size=(n, 2)).astype(np.float32),
            r.integers(0, n, e).astype(np.int32),
            r.integers(0, n, e).astype(np.int32),
            n_pad=n,
            e_pad=e,
            edge_attr=ea,
            y=r.normal(size=(n, output_size)).astype(np.float32),
            node_type_index=node_features - 2,
        )

    return jax.tree_util.tree_map(
        jnp.asarray, concat_graphs([one(s) for s in range(batch)])
    )


WORKLOADS = {
    "cylinder": dict(model="epd", mp=15, hidden=128, heads=4, n=2048, e=12288,
                     batch=8, out=2, edge_feats=3),
    "plate": dict(model="transformer", mp=10, hidden=64, heads=4, n=1536,
                  e=20480, batch=8, out=3, edge_feats=0),
    "panels": dict(model="transformer", mp=15, hidden=128, heads=4, n=2048,
                   e=12288, batch=8, out=3, edge_feats=0),
    "aneurysm": dict(model="transformer", mp=10, hidden=64, heads=4, n=66560,
                     e=524288, batch=1, out=3, edge_feats=0),
    # MeshGraphNet at 3D scale: remat bounds the live edge activations
    # (15 blocks x [E, h] residuals would not fit HBM otherwise)
    "aneurysm_epd": dict(model="epd", mp=15, hidden=128, heads=4, n=66560,
                         e=524288, batch=1, out=3, edge_feats=4, remat=True),
    # edge_layout="csr" variants: attention through the fused Pallas
    # softmax+SpMM kernel with the segment-reduction-free backward
    "aneurysm_csr": dict(model="transformer", mp=10, hidden=64, heads=4,
                         n=66560, e=524288, batch=1, out=3, edge_feats=0,
                         layout="csr"),
    "panels_csr": dict(model="transformer", mp=15, hidden=128, heads=4,
                       n=2048, e=12288, batch=8, out=3, edge_feats=0,
                       layout="csr"),
}


def measure(name, train_iters=30, eval_iters=30, include_eval=True):
    """Measure one workload; returns the result dict (run() prints it).
    ``train_iters``/``include_eval`` let callers (bench.py's CSR-vs-COO leg)
    bound wall time in throttled windows."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
    )
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.training.losses import l2_loss
    from graphphysics_tpu.utils.profiling import time_chained_steps

    w = WORKLOADS[name]
    node_raw = w["out"] + 2  # fields + node_type + time
    graph = build_graph(
        w["n"], w["e"], node_raw, w["edge_feats"], w["out"], w["batch"],
        layout=w.get("layout", "coo"),
    )
    cfg = SimulatorConfig(
        node_input_size=w["out"] + NodeType.SIZE,
        edge_input_size=w["edge_feats"],
        output_size=w["out"],
        feature_index_start=0,
        feature_index_end=w["out"],
        output_index_start=0,
        output_index_end=w["out"],
        node_type_index=node_raw - 2,
    )
    remat = w.get("remat", False)
    if w["model"] == "epd":
        model = EncodeProcessDecode(
            message_passing_num=w["mp"], node_input_size=cfg.node_input_size,
            edge_input_size=w["edge_feats"], output_size=w["out"],
            hidden_size=w["hidden"], remat=remat,
        )
    else:
        model = EncodeTransformDecode(
            message_passing_num=w["mp"], node_input_size=cfg.node_input_size,
            output_size=w["out"], hidden_size=w["hidden"], num_heads=w["heads"],
            remat=remat,
        )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    nti = cfg.node_type_index

    @jax.jit
    def step(state, graph):
        def loss_fn(p):
            (out, tgt, _), mut = sim.apply(
                {"params": p, "normalizer": state["normalizer"]}, graph,
                is_training=True, mutable=["normalizer"],
            )
            nt = graph.x[:, nti].astype(jnp.int32)
            return l2_loss(tgt, out, nt, [0, 5], node_valid=graph.node_mask), \
                mut["normalizer"]

        (loss, norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt = tx.update(grads, state["opt_state"], state["params"])
        import optax as _o

        return {
            "params": _o.apply_updates(state["params"], updates),
            "normalizer": norm,
            "opt_state": opt,
            "step": state["step"] + 1,
        }, loss

    def stepper(s, g):
        return step(s, g)

    sec, _ = time_chained_steps(
        stepper, state, graph, iters=train_iters, warmup=3
    )

    edges = w["batch"] * w["e"]
    result = {
        "workload": name,
        "ms_per_step": round(sec * 1e3, 3),
        "edges_per_sec": round(edges / sec, 1),
        "model": w["model"],
        "scale": f"{w['mp']}x{w['hidden']}",
    }
    if not include_eval:
        return result

    # Inference / serving rate: chained eval forwards with autoregressive
    # feedback (the rollout's per-frame work: normalize -> model ->
    # denormalize -> write prediction back into the input fields).
    out_w = w["out"]
    ev_vars = {"params": state["params"], "normalizer": state["normalizer"]}

    @jax.jit
    def eval_frame(fields, graph):
        g = graph.replace(x=graph.x.at[:, :out_w].set(fields))
        _, _, predicted = sim.apply(ev_vars, g, is_training=False)
        return predicted

    def eval_stepper(fields, g):
        pred = eval_frame(fields, g)
        return pred, pred[0, 0]  # (carry, probe) — probe forces full frame

    esec, _ = time_chained_steps(
        eval_stepper, graph.x[:, :out_w], graph, iters=eval_iters, warmup=3
    )
    result["rollout_ms_per_frame"] = round(esec * 1e3, 3)
    result["rollout_edges_per_sec"] = round(edges / esec, 1)
    return result


def run(name):
    print(json.dumps(measure(name)))


def _enable_cache():
    try:  # persistent XLA cache: retries across slow-compile tunnel windows
        from graphphysics_tpu.utils.compilation_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(".jax_compilation_cache")
    except Exception:
        pass


if __name__ == "__main__":
    _enable_cache()
    names = sys.argv[1:] or ["cylinder", "plate", "panels"]
    for nm in names:
        run(nm)
