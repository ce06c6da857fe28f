"""Scaling-efficiency harness: DP (weak scaling) and edge-partitioned graph
parallelism (strong scaling) vs device count.

The reference has no distributed support at all (SURVEY.md §2.4), so there is
no reference number to compare against — the target is the BASELINE.json
north star: >= 80% per-device efficiency as devices grow.

Run on a CPU-simulated mesh (relative efficiency only — CPU "devices" share
cores, so absolute numbers mean nothing and even the relative curve is
pessimistic):

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py

On a real pod slice the same script measures honest scaling (the chained-step
methodology of BASELINE.md): weak-scaling DP efficiency is
``t_step(1 device) / t_step(n devices)`` at fixed per-device batch; strong
scaling for one large partitioned mesh is ``t(1) / (n * t(n))``.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphphysics_tpu.core.graph import pad_graph_np, stack_graphs
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.models.processors import EncodeProcessDecode
from graphphysics_tpu.utils.profiling import time_chained_steps
from graphphysics_tpu.parallel import (
    make_dp_train_step,
    make_graph_parallel_train_step,
    make_mesh,
    partition_graph_halo_np,
    shard_batch,
)


def _graph(n, e, f=4, seed=0):
    r = np.random.default_rng(seed)
    x = r.normal(size=(n, f)).astype(np.float32)
    x[:, 2] = 0  # node type NORMAL
    pos = r.normal(size=(n, 2)).astype(np.float32)
    # balanced sender coverage for ANY (n, e), not just e % n == 0
    src = (np.arange(e, dtype=np.int64) * n) // e
    dst = np.clip(src + r.integers(-8, 9, e), 0, n - 1)
    y = r.normal(size=(n, 2)).astype(np.float32)
    return pad_graph_np(
        x, pos, src.astype(np.int32), dst.astype(np.int32), n, e,
        edge_attr=r.normal(size=(e, 3)).astype(np.float32),
        y=y, node_type_index=2,
    )


def _sim(mp=4, hidden=32):
    cfg = SimulatorConfig(
        node_input_size=2 + 9, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=mp, node_input_size=2 + 9, edge_input_size=3,
        output_size=2, hidden_size=hidden,
    )
    return Simulator(config=cfg, model=model)


def _time_chained(step, state, batch, iters=20, warmup=3):
    # the canonical chained-step methodology (see CLAUDE.md measurement notes)
    dt, _ = time_chained_steps(step, state, batch, iters=iters, warmup=warmup)
    return dt


def dp_weak_scaling(per_device_graphs=1, n=1024, e=6144, device_counts=None):
    """Fixed per-device batch; efficiency = t(1)/t(k)."""
    sim = _sim()
    tx = optax.adamw(1e-3)
    results = {}
    device_counts = device_counts or [1, 2, 4, 8]
    for nd in device_counts:
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        graphs = [_graph(n, e, seed=i) for i in range(nd * per_device_graphs)]
        batch = stack_graphs(graphs)
        gb = shard_batch(batch, mesh)
        from graphphysics_tpu.core.graph import flatten_batched_graph

        variables = sim.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            flatten_batched_graph(jax.tree_util.tree_map(jnp.asarray, batch)),
        )
        state = {
            "params": variables["params"],
            "normalizer": variables["normalizer"],
            "opt_state": tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }
        step = make_dp_train_step(sim, tx, [0, 5], mesh)
        dt = _time_chained(step, state, gb)
        results[nd] = dt
        base = min(results)  # efficiency vs the smallest measured count
        print(f"DP weak scaling {nd} dev: {dt*1e3:.2f} ms/step "
              f"(eff {results[base]/dt:.2%})")
    base = min(results)
    return {
        "ms_per_step": {k: v * 1e3 for k, v in results.items()},
        "efficiency": {k: results[base] / v for k, v in results.items()},
    }


def halo_strong_scaling(n=8192, e=49152, device_counts=None,
                        halo_dtype=None, stub_exchange=False):
    """One large mesh partitioned across devices; efficiency = t(1)/(k*t(k)).

    ``stub_exchange=True`` times the SAME step with the halo all_to_all
    replaced by identity (``ops.halo.stub_exchange_for_benchmark``): the gap
    between the two curves is the collective's share of the step, the rest
    of any deficit is imbalance/overhead (results are numerically wrong —
    timing only). ``halo_dtype="bf16"`` ships boundary rows 16-bit; note the
    CPU backend upcasts bf16 collectives it can't run natively, so only a
    real TPU mesh shows the byte saving.
    """
    import contextlib

    from graphphysics_tpu.ops.halo import stub_exchange_for_benchmark

    sim = _sim()  # fresh model per call: the sharded-step cache keys on it,
    # so stubbed and real runs never share a compiled step
    tx = optax.adamw(1e-3)
    g = _graph(n, e, seed=0)
    results = {}
    device_counts = device_counts or [1, 2, 4, 8]
    ctx = (
        stub_exchange_for_benchmark if stub_exchange else contextlib.nullcontext
    )
    label = "halo strong scaling" + (" [no-comm stub]" if stub_exchange else "")
    with ctx():
        for nd in device_counts:
            if nd > len(jax.devices()):
                break
            mesh = make_mesh(nd, axis_names=("graph",))
            parts = partition_graph_halo_np(g, nd, axis_name="graph")
            if halo_dtype:
                parts = parts.replace(halo_dtype=halo_dtype)
            variables = sim.init(
                {"params": jax.random.key(0), "sample": jax.random.key(1)}, g
            )
            state = {
                "params": variables["params"],
                "normalizer": variables["normalizer"],
                "opt_state": tx.init(variables["params"]),
                "step": jnp.zeros((), jnp.int32),
            }
            step = make_graph_parallel_train_step(sim, tx, [0, 5], mesh)
            gb = shard_batch(parts, mesh, axis_name="graph")
            dt = _time_chained(step, state, gb)
            results[nd] = dt
            base = min(results)  # efficiency vs the smallest measured count
            print(f"{label} {nd} dev: {dt*1e3:.2f} ms/step "
                  f"(eff {base*results[base]/(nd*dt):.2%})")
    base = min(results)
    return {
        "ms_per_step": {k: v * 1e3 for k, v in results.items()},
        "efficiency": {
            k: base * results[base] / (k * v) for k, v in results.items()
        },
    }


def rollout_weak_scaling(n=1024, e=6144, T=16, device_counts=None):
    """Batched validation rollouts (``jitted_batched_rollout``): one
    trajectory per device, weak scaling — efficiency = t(1)/t(k). The
    reference validates strictly sequentially, so its cost is k*t(1)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graphphysics_tpu.training.rollout import jitted_batched_rollout

    sim = _sim()
    g = _graph(n, e, seed=0)
    variables = sim.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, g
    )
    variables = {
        "params": variables["params"], "normalizer": variables["normalizer"]
    }
    frames_one = stack_graphs([_graph(n, e, seed=t) for t in range(T)])
    results = {}
    device_counts = device_counts or [1, 2, 4, 8]
    for nd in device_counts:
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        batch = shard_batch(stack_graphs([frames_one] * nd), mesh)
        keys = jax.device_put(
            jax.random.split(jax.random.key(0), nd),
            NamedSharding(mesh, P("data")),
        )
        rep = jax.device_put(variables, NamedSharding(mesh, P()))

        depth = 4  # chained dependent rollouts (CLAUDE.md methodology:
        # single dispatch+fetch timings carry ~50 ms tunnel RTT per call)

        def chain():
            b, total = batch, None
            for _ in range(depth):
                preds, _ = jitted_batched_rollout(sim, rep, b, keys)
                s = preds.sum()
                total = s if total is None else total + s
                # data-depend the next rollout on this one (same shapes:
                # the jit cache still hits)
                b = b.replace(x=b.x + s * 0)
            return float(total)  # fetch-synced

        chain()  # compile both input variants
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain()
            best = min(best, (time.perf_counter() - t0) / depth)
        results[nd] = best
        base = min(results)
        print(f"rollout weak scaling {nd} dev ({nd} trajectories): "
              f"{best*1e3:.2f} ms (eff {results[base]/best:.2%})")
    base = min(results)
    return {
        "ms_per_rollout_batch": {k: v * 1e3 for k, v in results.items()},
        "efficiency": {k: results[base] / v for k, v in results.items()},
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--attribution", action="store_true",
                    help="halo strong scaling three ways — exact, no-comm "
                         "stub, bf16 wire — to attribute the deficit "
                         "(collective share vs imbalance/overhead)")
    args = ap.parse_args()

    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    if args.attribution:
        exact = halo_strong_scaling()
        nocomm = halo_strong_scaling(stub_exchange=True)
        bf16 = halo_strong_scaling(halo_dtype="bf16")
        share = {
            k: round(1.0 - nocomm["ms_per_step"][k] / exact["ms_per_step"][k], 4)
            for k in exact["ms_per_step"]
            if k in nocomm["ms_per_step"]
        }
        out = {
            "devices": len(jax.devices()),
            "platform": jax.devices()[0].platform,
            "halo_strong_exact": exact,
            "halo_strong_nocomm": nocomm,
            "halo_strong_bf16_wire": bf16,
            "collective_share_of_step": share,
            "note": ("collective_share_of_step = 1 - t_nocomm/t_exact per "
                     "device count; the remainder of any efficiency deficit "
                     "is imbalance/overhead. CPU backends upcast bf16 "
                     "collectives, so bf16_wire only shows the byte saving "
                     "on real TPU meshes."),
        }
    else:
        out = {
            "devices": len(jax.devices()),
            "platform": jax.devices()[0].platform,
            "dp_weak": dp_weak_scaling(),
            "halo_strong": halo_strong_scaling(),
            "rollout_weak": rollout_weak_scaling(),
        }
    print(json.dumps(out, indent=2, default=str))
