"""Single-chip max-scale probe: the largest trainable mesh per memory lever.

Binary/doubling search over the node count (edges = 8x nodes, aneurysm-like
degree) for the largest single graph whose full train step (fwd+bwd+AdamW,
donated state) EXECUTES on one chip, for the two flagship models and each
memory lever. Motivates edge-partitioned training with numbers (VERDICT r2
item 7) and gives the partitioned-scale target: meshes past the table need
``--graph_partition``.

OOM detection is allocation-time, so the numbers are valid even in
throttled windows (speed varies >20x; capacity does not).

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/max_scale.py \
        [--configs epd,epd_remat,...] [--start 65536]

Prints one JSON line per (config, probe) as it goes (resumable by eye), and
a final summary dict.
"""

import argparse
import gc
import json

import numpy as np


def build_step(model_kind, lever):
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
    )
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.training.losses import l2_loss

    dtype = jnp.bfloat16 if lever == "bf16" else None
    kw = dict(
        remat=lever in ("remat", "scan_remat"),
        scan_blocks=lever in ("scan_blocks", "scan_remat"),
        dtype=dtype,
    )
    if model_kind == "epd":
        cfg = SimulatorConfig(
            node_input_size=2 + NodeType.SIZE, edge_input_size=3,
            output_size=2, feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
        )
        model = EncodeProcessDecode(
            message_passing_num=15, node_input_size=cfg.node_input_size,
            edge_input_size=3, output_size=2, hidden_size=128, **kw,
        )
    else:
        cfg = SimulatorConfig(
            node_input_size=2 + NodeType.SIZE, edge_input_size=0,
            output_size=2, feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
        )
        model = EncodeTransformDecode(
            message_passing_num=10, node_input_size=cfg.node_input_size,
            output_size=2, hidden_size=64, num_heads=4, **kw,
        )
    sim = Simulator(config=cfg, model=model)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)

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
        probe = loss + jax.tree_util.tree_leaves(new_params)[0].ravel()[0] * 0
        return {
            "params": new_params, "normalizer": norm, "opt_state": opt,
            "step": state["step"] + 1,
        }, probe

    return sim, tx, step, cfg


def make_graph(n, deg=8):
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.core.graph import pad_graph_np

    e = deg * n
    r = np.random.default_rng(0)
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = 0
    s = r.integers(0, n, e).astype(np.int32)
    t = r.integers(0, n, e).astype(np.int32)
    g = pad_graph_np(
        x, r.normal(size=(n, 2)).astype(np.float32), s, t, n, e,
        edge_attr=r.normal(size=(e, 3)).astype(np.float32),
        y=r.normal(size=(n, 2)).astype(np.float32), node_type_index=2,
    )
    return jax.tree_util.tree_map(jnp.asarray, g)


def try_step(model_kind, lever, n):
    """True if one full train step executes at ``n`` nodes, False on OOM."""
    import jax
    import jax.numpy as jnp

    sim, tx, step, cfg = build_step(model_kind, lever)
    try:
        g = make_graph(n)
        variables = sim.init({"params": jax.random.key(0)}, g)
        state = {
            "params": variables["params"],
            "normalizer": variables["normalizer"],
            "opt_state": tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }
        state, probe = step(state, g)
        ok = bool(np.isfinite(float(probe)))
        del state, probe, g, variables
        return ok, None
    except Exception as e:
        msg = str(e)
        oom_markers = (
            "RESOURCE_EXHAUSTED", "Out of memory", "Ran out of memory",
            "exceeds the", "OOM", "hbm capacity",
            # through the tunnel, a program exceeding HBM fails at COMPILE
            # time as an INTERNAL remote_compile HTTP 500 (the 'Ran out of
            # memory in memory space hbm' detail stays in the service log)
            "remote_compile", "HTTP 500",
        )
        if any(m in msg for m in oom_markers):
            # the classified message rides along so broad markers
            # (remote_compile / HTTP 500 cover ANY tunnel compile error)
            # stay auditable in the fits=false JSON lines
            return False, msg.splitlines()[0][:300]
        raise
    finally:
        gc.collect()


def search(model_kind, lever, start, rounds=3):
    """Doubling search then midpoint refinement; node counts stay multiples
    of 4096 so shapes are tile-friendly."""
    step_q = 4096
    n = start
    last_ok, first_bad = None, None
    while first_bad is None:
        ok, exc = try_step(model_kind, lever, n)
        print(json.dumps({"config": f"{model_kind}+{lever}", "nodes": n,
                          "fits": ok, **({"exc": exc} if exc else {})}),
              flush=True)
        if ok:
            last_ok = n
            n *= 2
        else:
            first_bad = n
            if last_ok is None:
                # start itself OOMs: halve downward until something fits
                while n > step_q:
                    n //= 2
                    ok, exc = try_step(model_kind, lever, n)
                    print(json.dumps(
                        {"config": f"{model_kind}+{lever}", "nodes": n,
                         "fits": ok, **({"exc": exc} if exc else {})}),
                        flush=True)
                    if ok:
                        last_ok = n
                        break
                    first_bad = n
                if last_ok is None:
                    return 0
    for _ in range(rounds):
        mid = (last_ok + first_bad) // 2 // step_q * step_q
        if mid in (last_ok, first_bad):
            break
        ok, exc = try_step(model_kind, lever, mid)
        print(json.dumps({"config": f"{model_kind}+{lever}", "nodes": mid,
                          "fits": ok, **({"exc": exc} if exc else {})}),
              flush=True)
        if ok:
            last_ok = mid
        else:
            first_bad = mid
    return last_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma list like epd,epd_remat,tf_bf16 (default all)")
    ap.add_argument("--start", type=int, default=16384)
    ap.add_argument("--rounds", type=int, default=3,
                    help="midpoint-refinement rounds (more = tighter final "
                         "interval; each round is one compile)")
    args = ap.parse_args()

    all_cfgs = []
    for mk in ("epd", "tf"):
        for lever in ("none", "remat", "scan_blocks", "scan_remat", "bf16"):
            all_cfgs.append((mk, lever))
    if args.configs:
        want = set(args.configs.split(","))
        all_cfgs = [
            (m, l) for (m, l) in all_cfgs
            if (f"{m}_{l}" in want or (l == "none" and m in want))
        ]

    out = {}
    for mk, lever in all_cfgs:
        out[f"{mk}+{lever}"] = search(mk, lever, args.start, rounds=args.rounds)
        print(json.dumps({"summary_so_far": out}), flush=True)
    print(json.dumps({"max_trainable_nodes": out, "edges_per_node": 8}))


if __name__ == "__main__":
    main()
