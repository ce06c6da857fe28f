"""MEASURE the per-part compute term t_comp(P) of the ICI projection on the
real chip (VERDICT r4 item 1: replace the projection's MAC-ratio
extrapolation with measured per-part step times).

Method: the single-chip environment can execute one device's exact workload
in a P-way edge-partitioned step — the partitioner's budgets, exchange-table
shapes and CSR bounds are all real — by running the SAME
``make_graph_parallel_train_step`` over a ONE-device ``graph`` mesh (psum
over a size-1 axis is identity) with the halo ``all_to_all`` stubbed to
identity (``ops.halo.stub_exchange_for_benchmark``). What remains is
precisely the projection's t_comp: local gathers, edge/node MLPs or the
fused attention kernel, loss, backward, optimizer — on the straggler-sized
(uniform) per-part budgets, padding slots computed for real.

The chip throttles >20x across hours, so absolute ms are window-stamped
(chip probe TF/s before/after) and the quantity fed back into
``ici_projection.py --measured`` is the IN-WINDOW RATIO
``t_comp(P) / t_comp(P=1)`` — throttle-independent like every same-window
ratio on this machine (CLAUDE.md).

Writes one JSON line per (model, n, P) config to ``--out`` INCREMENTALLY
(tunnel wedge windows can kill long runs) and a final summary line.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ici_tcomp_measure.py \
        --n 41 --model epd --parts 1 2 4 8 16 --out /tmp/tcomp_epd_41.jsonl
"""

import argparse
import json
import sys
import time

import numpy as np


def _probe_tflops():
    from graphphysics_tpu.utils.profiling import chip_probe_tflops

    try:
        return round(chip_probe_tflops(), 1)
    except Exception:
        return None


def build_feature_graph(n_side, model, out_dim, seed=0):
    """Tet-grid mesh (same topology family as the projection's
    ``halo_volume.build_graph``) with random features/targets so the train
    step is real."""
    from graphphysics_tpu.core.graph import pad_graph_np, round_up
    from graphphysics_tpu.topology.build import cells_to_edges
    from graphphysics_tpu.utils.synthetic import tet_grid

    points, tets = tet_grid(n_side)
    s, r = cells_to_edges(tets)
    n = len(points)
    n_pad = round_up(n, 128 * 16)  # divisible by every P and CSR block
    rng = np.random.default_rng(seed)
    node_raw = out_dim + 2  # fields + node_type + time
    x = rng.normal(size=(n, node_raw)).astype(np.float32)
    x[:, node_raw - 2] = rng.integers(0, 7, size=n)
    edge_feats = 3 if model == "epd" else 0
    ea = (
        rng.normal(size=(len(s), edge_feats)).astype(np.float32)
        if edge_feats
        else None
    )
    g = pad_graph_np(
        x, points.astype(np.float32),
        s.astype(np.int32), r.astype(np.int32),
        n_pad=n_pad, e_pad=len(s) + 128,
        edge_attr=ea,
        y=rng.normal(size=(n, out_dim)).astype(np.float32),
        node_type_index=node_raw - 2,
    )
    return g, edge_feats


def one_part_shard(part, p_index=0):
    """Stack one part's arrays back to a [1, ...] leading axis — the local
    shard a device sees inside the P-way shard_map — keeping the static
    meta fields."""
    import jax

    return jax.tree_util.tree_map(lambda a: a[p_index : p_index + 1], part)


def measure_config(g, model_kind, out_dim, edge_feats, parts, headroom,
                   csr, split_modes, iters, budget_s):
    """Yield one result dict per (P, split-mode); ``split_modes`` e.g.
    ``[False]`` or ``[False, True]`` — with both, the plain and split-edge
    layouts interleave in the SAME measurement rounds, giving a same-window
    split-vs-unsplit comparison per P."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphphysics_tpu.core.graph import round_up
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
    )
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.ops.halo import stub_exchange_for_benchmark
    from graphphysics_tpu.parallel import make_mesh, shard_batch
    from graphphysics_tpu.parallel.dp import make_graph_parallel_train_step
    from graphphysics_tpu.parallel.graph_partition import (
        _halo_requests,
        partition_graph_halo_np,
    )
    from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
    from graphphysics_tpu.utils.profiling import time_chained_steps

    node_raw = out_dim + 2
    cfg = SimulatorConfig(
        node_input_size=out_dim + NodeType.SIZE,
        edge_input_size=edge_feats,
        output_size=out_dim,
        feature_index_start=0,
        feature_index_end=out_dim,
        output_index_start=0,
        output_index_end=out_dim,
        node_type_index=node_raw - 2,
    )
    if model_kind == "epd":
        # the flagship 15x128 — remat like the production aneurysm_epd
        # config (524k-edge workloads don't hold 15 [E,h] residuals in HBM);
        # every P shares the setting so in-window ratios are consistent
        model = EncodeProcessDecode(
            message_passing_num=15, node_input_size=cfg.node_input_size,
            edge_input_size=edge_feats, output_size=out_dim,
            hidden_size=128, remat=True,
        )
    else:
        model = EncodeTransformDecode(
            message_passing_num=10, node_input_size=cfg.node_input_size,
            output_size=out_dim, hidden_size=64, num_heads=4, remat=True,
        )
    sim = Simulator(config=cfg, model=model)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)
    mesh1 = make_mesh(1, (GRAPH_AXIS,))
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh1
    )

    # init on a TINY unpartitioned graph: params depend only on feature
    # dims, and a flax init forward on the 1M-node shard would OOM exactly
    # like the trainer's partitioned-init issue (trainer.py fit notes)
    from graphphysics_tpu.core.graph import pad_graph_np

    rng0 = np.random.default_rng(1)
    xi = rng0.normal(size=(256, node_raw)).astype(np.float32)
    xi[:, node_raw - 2] = rng0.integers(0, 7, 256)
    init_g = pad_graph_np(
        xi, rng0.normal(size=(256, 3)).astype(np.float32),
        rng0.integers(0, 256, 512).astype(np.int32),
        rng0.integers(0, 256, 512).astype(np.int32),
        n_pad=256, e_pad=512,
        edge_attr=(rng0.normal(size=(512, edge_feats)).astype(np.float32)
                   if edge_feats else None),
        y=rng0.normal(size=(256, out_dim)).astype(np.float32),
        node_type_index=node_raw - 2,
    )
    variables = sim.init(
        {"params": jax.random.key(0)},
        jax.tree_util.tree_map(jnp.asarray, init_g),
    )

    n = g.num_nodes
    nl_all = {p: n // p for p in parts}
    senders_g = np.asarray(g.senders)
    receivers_g = np.asarray(g.receivers)
    edge_mask_g = np.asarray(g.edge_mask)

    from graphphysics_tpu.utils.profiling import fetch_sync

    def fresh_state():
        return {
            "params": jax.tree_util.tree_map(jnp.array, variables["params"]),
            "normalizer": jax.tree_util.tree_map(
                jnp.array, variables["normalizer"]
            ),
            "opt_state": tx.init(jax.tree_util.tree_map(
                jnp.array, variables["params"]
            )),
            "step": jnp.zeros((), jnp.int32),
        }

    # ---- phase A: partition + compile every P up front --------------------
    # The chip's throttle RAMPS across the minutes of compile (observed 2x
    # within one run); ratios are only trustworthy when the configs they
    # compare run back-to-back. So: compile everything first, then measure
    # the configs INTERLEAVED in rounds — each round's ratios share one
    # window (plus probe stamps to flag residual drift).
    prepared = []
    for p in parts:
      nl = nl_all[p]
      requests = _halo_requests(
          senders_g, receivers_g // nl, edge_mask_g, nl, p
      )
      for split in split_modes:
          t0 = time.time()
          # trainer-identical budgets: canonical max x headroom, rounded
          trial = partition_graph_halo_np(
              g, p, csr=csr, split_local=split, _requests=requests
          )
          hb = round_up(int(trial.halo_send_idx.shape[2] * headroom), 8)
          if split:
              el = trial.num_local_edges
              eh = trial.senders.shape[1] - el
              eb = (round_up(int(el * headroom), 128),
                    round_up(int(eh * headroom), 128))
          else:
              eb = round_up(int(trial.senders.shape[1] * headroom), 128)
          part = partition_graph_halo_np(
              g, p, edge_budget_local=eb, halo_budget=hb, csr=csr,
              split_local=split, _requests=requests,
          )
          host_s = time.time() - t0
          shard = jax.tree_util.tree_map(jnp.asarray, one_part_shard(part))
          shard = shard_batch(shard, mesh1, GRAPH_AXIS)

          entry = {
              "model": model_kind, "P": p, "nodes": n, "n_local": nl,
              "edge_budget": (list(eb) if isinstance(eb, tuple) else eb),
              "halo_budget": hb, "csr": csr, "split": split,
              "headroom": headroom, "host_partition_s": round(host_s, 1),
          }
          try:
              state = fresh_state()
              with stub_exchange_for_benchmark():
                  tc = time.time()
                  state, loss = step(state, shard)  # compile + 1st step
                  fetch_sync(loss, state)
                  entry["compile_s"] = round(time.time() - tc, 1)
                  tc = time.time()
                  state, loss = step(state, shard)
                  fetch_sync(loss, state)
                  est = max(time.time() - tc, 1e-4)
              entry["est_ms"] = round(est * 1e3, 3)
              entry["loss_finite"] = bool(np.isfinite(float(loss)))
              key = str(p) + ("s" if split else "")
              prepared.append([key, est, state, shard])
          except Exception as exc:  # OOM through the tunnel = HTTP 500 / hbm
              msg = str(exc)
              kind = (
                  "oom"
                  if ("HTTP 500" in msg or "RESOURCE_EXHAUSTED" in msg
                      or "hbm" in msg.lower())
                  else "error"
              )
              entry[kind] = msg[:300]
          yield entry

    # ---- phase B: interleaved measurement rounds --------------------------
    rounds = 3
    per_slot_s = budget_s / max(rounds * max(len(prepared), 1), 1)
    for rnd in range(rounds):
        round_entry = {
            "event": "round", "idx": rnd,
            "probe_tflops_pre": _probe_tflops(), "t_ms": {},
        }
        for rec in prepared:
            key, est, state, shard = rec
            it = max(2, min(iters, int(per_slot_s / max(est, 1e-4))))
            with stub_exchange_for_benchmark():
                sec, state = time_chained_steps(
                    step, state, shard, iters=it, warmup=1
                )
            rec[1] = sec  # refine the estimate with the live reading
            rec[2] = state
            round_entry["t_ms"][key] = round(sec * 1e3, 3)
        round_entry["probe_tflops_post"] = _probe_tflops()
        yield round_entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=41)
    ap.add_argument("--model", default="epd", choices=["epd", "transformer"])
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--headroom", type=float, default=1.0,
                    help="partition_edge_headroom (1.0 = the docs/scaling.md "
                         "recommendation for fixed-topology datasets)")
    ap.add_argument("--split", action="store_true",
                    help="split-edge [local|halo] layout (attention overlap "
                         "mode; transformer only)")
    ap.add_argument("--compare_split", action="store_true",
                    help="interleave BOTH the plain and split layouts in "
                         "the same rounds (same-window split-vs-unsplit)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget_s", type=float, default=25.0,
                    help="TOTAL chained-step seconds spread across all "
                         "configs and rounds (each (config, round) slot "
                         "gets budget_s / (rounds * configs), min 2 steps "
                         "— slow steps can exceed the budget)")
    ap.add_argument("--out", default=None, help="JSONL incremental output")
    args = ap.parse_args()

    try:
        from graphphysics_tpu.utils.compilation_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(".jax_compilation_cache")
    except Exception:
        pass

    out_dim = 2 if args.model == "epd" else 3
    csr = args.model == "transformer"
    g, edge_feats = build_feature_graph(args.n, args.model, out_dim)

    # hilbert locality reorder before the contiguous cut — the projection's
    # (and the Trainer's partition_reorder) configuration
    from graphphysics_tpu.parallel.reorder import (
        locality_permutation,
        permute_graph_np,
    )

    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes,
        edge_mask=g.edge_mask, pos=g.pos, method="hilbert",
    )
    g = permute_graph_np(g, perm)

    sink = open(args.out, "a") if args.out else None

    def emit(obj):
        line = json.dumps(obj)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    emit({"event": "start", "n_side": args.n, "nodes": int(g.num_nodes),
          "edges": int(g.num_edges), "model": args.model,
          "probe_tflops": _probe_tflops(),
          "ts": time.strftime("%Y-%m-%d %H:%M:%S")})

    if args.compare_split:
        split_modes = [False, True]
    else:
        split_modes = [args.split]
    rows = []
    for entry in measure_config(
        g, args.model, out_dim, edge_feats, args.parts, args.headroom,
        csr, split_modes, args.iters, args.budget_s,
    ):
        rows.append(entry)
        emit(entry)

    cfg_rows = [r for r in rows if "P" in r]
    round_rows = [r for r in rows if r.get("event") == "round"]
    summary = {
        "event": "summary", "model": args.model, "nodes": int(g.num_nodes),
        "headroom": args.headroom, "split_modes": split_modes,
        "probe_tflops_end": _probe_tflops(),
        "rows": [
            {k: r.get(k) for k in
             ("P", "split", "est_ms", "edge_budget", "halo_budget",
              "oom", "error")}
            for r in cfg_rows
        ],
    }
    # per-round SAME-WINDOW ratios t(P)/t(base); base = smallest P that
    # fit (P=1 at 1M-node scale OOMs — the whole point of partitioning).
    # Median across rounds is the reported number, min/max the spread.
    measured_ps = sorted({
        int(k.rstrip("s")) for rr in round_rows for k in rr["t_ms"]
        if not k.endswith("s")
    } or {
        int(k.rstrip("s")) for rr in round_rows for k in rr["t_ms"]
    })
    # ratio base: smallest unsplit P if available, else smallest split P
    base_p = None
    if measured_ps:
        cand = str(measured_ps[0])
        base_p = cand if any(
            cand in rr["t_ms"] for rr in round_rows
        ) else cand + "s"
    summary["ratio_base_P"] = int(base_p.rstrip("s")) if base_p else None
    for r in summary["rows"]:
        p = str(r["P"]) + ("s" if r.get("split") else "")
        ratios = [
            rr["t_ms"][p] / rr["t_ms"][base_p]
            for rr in round_rows
            if base_p and p in rr["t_ms"] and base_p in rr["t_ms"]
        ]
        times = [rr["t_ms"][p] for rr in round_rows if p in rr["t_ms"]]
        if times:
            r["t_comp_ms"] = round(float(np.median(times)), 3)
        if ratios:
            key = "ratio_vs_p1" if base_p == "1" else "ratio_vs_base"
            r[key] = round(float(np.median(ratios)), 4)
            r["ratio_spread"] = [
                round(float(np.min(ratios)), 4),
                round(float(np.max(ratios)), 4),
            ]
        # same-window split overhead: split config vs its unsplit twin
        if r.get("split"):
            twin = str(r["P"])
            svu = [
                rr["t_ms"][p] / rr["t_ms"][twin]
                for rr in round_rows
                if p in rr["t_ms"] and twin in rr["t_ms"]
            ]
            if svu:
                r["split_over_unsplit"] = round(float(np.median(svu)), 4)
    emit(summary)
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
