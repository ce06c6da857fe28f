"""Serving-latency benchmark: AOT StableHLO artifact vs live flax apply.

The deployment question the reference cannot ask (it serves through its
full Python stack, ``graphphysics/predict.py:32-114``): what does one
autoregressive serving frame cost through (a) the live ``Simulator.apply``
under jit and (b) the ``grph-export`` AOT artifact (``utils/export.py``) —
same math, params baked in, no Python model stack at call time.

Chained-frame fetch-synced methodology (utils/profiling; single calls
through the tunnel carry ~50 ms RTT). Run on the TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/serving.py \
        [--workloads cylinder,aneurysm]

Prints one JSON line per workload.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(name: str, iters: int = 30):
    import jax
    import jax.numpy as jnp

    import workloads as wl
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
    )
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.utils.export import export_eval_step, load_eval_step
    from graphphysics_tpu.utils.profiling import time_chained_steps

    w = wl.WORKLOADS[name]
    node_raw = w["out"] + 2
    graph = wl.build_graph(
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
    if w["model"] == "epd":
        model = EncodeProcessDecode(
            message_passing_num=w["mp"], node_input_size=cfg.node_input_size,
            edge_input_size=w["edge_feats"], output_size=w["out"],
            hidden_size=w["hidden"],
        )
    else:
        model = EncodeTransformDecode(
            message_passing_num=w["mp"], node_input_size=cfg.node_input_size,
            output_size=w["out"], hidden_size=w["hidden"],
            num_heads=w["heads"],
        )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, graph)
    ev_vars = {"params": variables["params"],
               "normalizer": variables["normalizer"]}
    out_w = w["out"]

    @jax.jit
    def live_frame(fields, g):
        g = g.replace(x=g.x.at[:, :out_w].set(fields))
        _, _, predicted = sim.apply(ev_vars, g, is_training=False)
        return predicted

    def live_stepper(fields, g):
        pred = live_frame(fields, g)
        return pred, pred[0, 0]

    live_s, _ = time_chained_steps(
        live_stepper, graph.x[:, :out_w], graph, iters=iters, warmup=3
    )

    t0 = time.perf_counter()
    blob = export_eval_step(sim, ev_vars, graph)
    export_s = time.perf_counter() - t0
    step = load_eval_step(blob)

    @jax.jit  # cache the call's trace — per-call retracing would swamp
    def aot_frame(fields, g):
        g = g.replace(x=g.x.at[:, :out_w].set(fields))
        return step(g)

    def aot_stepper(fields, g):
        pred = aot_frame(fields, g)
        return pred, pred[0, 0]

    aot_s, _ = time_chained_steps(
        aot_stepper, graph.x[:, :out_w], graph, iters=iters, warmup=3
    )

    edges = w["batch"] * w["e"]
    return {
        "workload": name,
        "live_ms_per_frame": round(live_s * 1e3, 3),
        "aot_ms_per_frame": round(aot_s * 1e3, 3),
        "aot_over_live": round(aot_s / live_s, 4),
        "serving_edges_per_sec": round(edges / aot_s, 1),
        "artifact_bytes": len(blob),
        "export_seconds": round(export_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="cylinder,aneurysm")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import workloads as wl

    wl._enable_cache()
    for name in args.workloads.split(","):
        print(json.dumps(run(name, iters=args.iters)), flush=True)


if __name__ == "__main__":
    main()
