"""Multi-epoch TRAINING at the single-chip capacity frontier (VERDICT r4
item 4: prove the ``max_scale_single_chip`` table's headline is a TRAINING
fact, not just a compile fact).

Config = the capacity table's tf+bf16 row: transformer 10x64 with bf16
activations at 229,376 nodes / 1,835,008 edges (edges = 8x nodes,
aneurysm-like degree, exactly ``benchmarks/max_scale.py``'s shapes) — the
largest non-remat transformer mesh one chip holds. Optionally
``--lever remat --nodes 524288`` for the remat frontier row.

The target is LEARNABLE (a smooth random Fourier map of mesh position, not
noise) so the loss has somewhere to go; the run streams K distinct graphs
per epoch ("epochs" over a small synthetic set), records every step's loss
+ wall, probes chip TF/s at the start/end of every epoch (shared-tenancy
windows must be stamped), and emits incremental JSONL so a tunnel wedge
mid-run still leaves evidence. Descending loss across epochs = the
capacity frontier trains.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/large_mesh_training.py \
        --nodes 229376 --epochs 4 --out /tmp/large_mesh_training.jsonl
"""

import argparse
import json
import time

import numpy as np


def make_learnable_graph(n, deg, out_dim, seed):
    """Random graph with a learnable target: y = smooth Fourier features of
    pos (+ small field dependence) — the same map for every graph, so SGD
    across graphs generalizes rather than memorizes noise."""
    from graphphysics_tpu.core.graph import pad_graph_np

    e = deg * n
    r = np.random.default_rng(seed)
    pos = r.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    fields = r.normal(size=(n, out_dim)).astype(np.float32)
    # fixed (seed-independent) target map
    rt = np.random.default_rng(7)
    w = rt.normal(size=(3, out_dim)).astype(np.float32)
    b = rt.normal(size=(out_dim,)).astype(np.float32)
    y = np.sin(pos @ w * 2.0 + b) * 0.1 + 0.05 * fields
    node_raw = out_dim + 2
    x = np.zeros((n, node_raw), np.float32)
    x[:, :out_dim] = fields
    s = r.integers(0, n, e).astype(np.int32)
    t = r.integers(0, n, e).astype(np.int32)
    return pad_graph_np(
        x, pos, s, t, n, e, y=y.astype(np.float32),
        node_type_index=node_raw - 2,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=229376)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--lever", default="bf16",
                    choices=["bf16", "remat", "none"])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--graphs", type=int, default=4,
                    help="distinct synthetic graphs per epoch")
    ap.add_argument("--budget_s", type=float, default=2400,
                    help="stop cleanly after this much wall time")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    try:
        from graphphysics_tpu.utils.compilation_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(".jax_compilation_cache")
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import EncodeTransformDecode
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.training.losses import l2_loss
    from graphphysics_tpu.utils.profiling import chip_probe_tflops

    sink = open(args.out, "a") if args.out else None

    def emit(obj):
        line = json.dumps(obj)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    def probe():
        try:
            return round(chip_probe_tflops(), 1)
        except Exception:
            return None

    out_dim = 2
    cfg = SimulatorConfig(
        node_input_size=out_dim + NodeType.SIZE, edge_input_size=0,
        output_size=out_dim, feature_index_start=0, feature_index_end=out_dim,
        output_index_start=0, output_index_end=out_dim, node_type_index=2,
    )
    model = EncodeTransformDecode(
        message_passing_num=10, node_input_size=cfg.node_input_size,
        output_size=out_dim, hidden_size=64, num_heads=4,
        remat=args.lever == "remat",
        dtype=jnp.bfloat16 if args.lever == "bf16" else None,
    )
    sim = Simulator(config=cfg, model=model)
    tx = optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=1e-4)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, graph):
        def loss_fn(p):
            (out, tgt, _), mut = sim.apply(
                {"params": p, "normalizer": state["normalizer"]}, graph,
                is_training=True, mutable=["normalizer"],
            )
            nt = graph.x[:, 2].astype(jnp.int32)
            return l2_loss(
                tgt, out, nt, [0, 5], node_valid=graph.node_mask
            ), mut["normalizer"]

        (loss, norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        upd, opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], upd)
        probe_v = (
            loss + jax.tree_util.tree_leaves(new_params)[0].ravel()[0] * 0
        )
        return {
            "params": new_params, "normalizer": norm, "opt_state": opt,
            "step": state["step"] + 1,
        }, probe_v

    n, e = args.nodes, args.deg * args.nodes
    emit({"event": "start", "nodes": n, "edges": e, "lever": args.lever,
          "epochs": args.epochs, "graphs": args.graphs,
          "probe_tflops": probe(),
          "ts": time.strftime("%Y-%m-%d %H:%M:%S")})

    graphs = [
        jax.tree_util.tree_map(
            jnp.asarray, make_learnable_graph(n, args.deg, out_dim, seed)
        )
        for seed in range(args.graphs)
    ]
    variables = sim.init({"params": jax.random.key(0)}, graphs[0])
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    # warmup/compile outside the timed epochs (the first step holds the
    # compile; epoch walls must measure steady steps only)
    state, loss0 = step(state, graphs[0])
    float(loss0)

    t_start = time.time()
    epoch_means = []
    stop = False
    for epoch in range(args.epochs):
        p0 = probe()
        # CHAIN the epoch's steps and fetch once at the end — per-step
        # fetches would add the ~50 ms tunnel RTT to every wall
        # (CLAUDE.md measurement methodology); the state dependency chains
        # the steps, so epoch_wall / steps is the honest per-step time.
        pending = []
        t0 = time.time()
        for g in graphs:
            state, loss = step(state, g)
            pending.append(loss)
        losses = [float(v) for v in pending]  # fetch syncs the whole chain
        w = (time.time() - t0) / len(graphs)
        mean_loss = float(np.mean(losses))
        epoch_means.append(mean_loss)
        emit({"event": "epoch", "epoch": epoch,
              "mean_loss": round(mean_loss, 6),
              "losses": [round(v, 6) for v in losses],
              "ms_per_step": round(w * 1e3, 1),
              "edges_per_sec": round(e / w, 1),
              "probe_tflops_pre": p0, "probe_tflops_post": probe()})
        if time.time() - t_start > args.budget_s:
            stop = True
        if stop:
            break

    summary = {
        "event": "summary", "nodes": n, "edges": e, "lever": args.lever,
        "epoch_mean_losses": [round(v, 6) for v in epoch_means],
        "descending": bool(
            len(epoch_means) >= 2 and epoch_means[-1] < epoch_means[0]
        ),
        "minutes": round((time.time() - t_start) / 60, 1),
    }
    emit(summary)
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
