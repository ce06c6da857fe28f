"""Environment / health checks for production deployments: ``grph-doctor``.

The reference has no analog; on shared TPU fleets the questions this
answers come up constantly: is the chip visible, how throttled is it RIGHT
NOW (shared-tenancy chips vary >20x across hours), is the input pipeline
deterministic (the contract exact resume relies on), does a jitted train
step replay bitwise, and is the persistent compilation cache active.

    grph-doctor [--skip-probes] [--skip-determinism]

Exit code 0 = all checks passed.
"""

from __future__ import annotations

import argparse
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="graphphysics_tpu health checks")
    p.add_argument("--skip-probes", action="store_true",
                   help="skip the matmul/HBM throughput probes")
    p.add_argument("--skip-determinism", action="store_true",
                   help="skip the item/step bitwise replay checks")
    return p


def _check(name: str, fn, results: list) -> None:
    try:
        detail = fn()
        results.append(True)
        print(f"  ok    {name}" + (f" — {detail}" if detail else ""))
    except Exception as e:  # noqa: BLE001 — a doctor reports, never crashes
        results.append(False)
        print(f"  FAIL  {name} — {type(e).__name__}: {e}")


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    results: list = []

    def devices():
        import jax

        devs = jax.devices()
        return f"{jax.default_backend()}: {len(devs)}x {devs[0].device_kind}"

    _check("device backend", devices, results)

    def cache_status():
        import jax

        d = jax.config.jax_compilation_cache_dir
        return f"compilation cache at {d}" if d else (
            "compilation cache OFF (enable with --compilation_cache_dir; "
            "TPU compiles take minutes)"
        )

    _check("compilation cache", cache_status, results)

    if not args.skip_probes:
        def probes():
            from graphphysics_tpu.utils.profiling import (
                chip_probe_gbps,
                chip_probe_tflops,
            )

            tfs = chip_probe_tflops()
            gbs = chip_probe_gbps()
            return (
                f"{tfs:.1f} TF/s matmul, {gbs:.1f} GB/s HBM right now "
                f"(shared chips throttle >20x across hours — compare "
                f"measurements only against same-run probes)"
            )

        _check("chip throughput probes", probes, results)

    if not args.skip_determinism:
        def item_determinism():
            import tempfile

            from graphphysics_tpu.dataset.h5_dataset import H5Dataset
            from graphphysics_tpu.dataset.preprocessing import build_preprocessing
            from graphphysics_tpu.utils.determinism import check_item_determinism
            from graphphysics_tpu.utils.synthetic import write_cylinder_h5

            tmp = tempfile.mkdtemp(prefix="gp_doctor_")
            h5, meta = write_cylinder_h5(tmp, num_traj=1, steps=4, nx=8, ny=6)
            pre = build_preprocessing(
                noise_parameters={"noise_index_start": [0],
                                  "noise_index_end": [2],
                                  "noise_scale": 0.02,
                                  "node_type_index": 2},
            )
            ds = H5Dataset(h5_path=h5, meta_path=meta, preprocessing=pre,
                           node_type_index=2)
            report = check_item_determinism(ds, 1)
            if not report["deterministic"]:
                raise AssertionError(
                    f"item replay mismatches: {report['mismatches']}"
                )
            return "noisy dataset item replays bitwise"

        _check("input-pipeline determinism", item_determinism, results)

        def step_determinism():
            from functools import partial

            import jax
            import jax.numpy as jnp
            import numpy as np
            import optax

            from graphphysics_tpu.core.graph import pad_graph_np
            from graphphysics_tpu.core.nodetype import NodeType
            from graphphysics_tpu.models.processors import EncodeProcessDecode
            from graphphysics_tpu.models.simulator import (
                Simulator,
                SimulatorConfig,
            )
            from graphphysics_tpu.training.losses import l2_loss
            from graphphysics_tpu.utils.determinism import (
                check_step_determinism,
            )

            r = np.random.default_rng(0)
            n, e = 256, 1024
            x = r.normal(size=(n, 4)).astype(np.float32)
            x[:, 2] = r.integers(0, 7, size=n)
            g = pad_graph_np(
                x, r.normal(size=(n, 2)).astype(np.float32),
                r.integers(0, n, e).astype(np.int32),
                r.integers(0, n, e).astype(np.int32),
                n_pad=n, e_pad=e,
                edge_attr=r.normal(size=(e, 3)).astype(np.float32),
                y=r.normal(size=(n, 2)).astype(np.float32),
                node_type_index=2,
            )
            g = jax.tree_util.tree_map(jnp.asarray, g)
            cfg = SimulatorConfig(
                node_input_size=2 + NodeType.SIZE, edge_input_size=3,
                output_size=2, feature_index_start=0, feature_index_end=2,
                output_index_start=0, output_index_end=2, node_type_index=2,
            )
            sim = Simulator(config=cfg, model=EncodeProcessDecode(
                message_passing_num=2, node_input_size=cfg.node_input_size,
                edge_input_size=3, output_size=2, hidden_size=32,
            ))
            variables = sim.init({"params": jax.random.key(0)}, g)
            tx = optax.adamw(1e-3)
            state = {
                "params": variables["params"],
                "normalizer": variables["normalizer"],
                "opt_state": tx.init(variables["params"]),
            }

            @partial(jax.jit, donate_argnums=(0,))
            def step(state, graph):
                def loss_fn(p):
                    (out, tgt, _), mut = sim.apply(
                        {"params": p, "normalizer": state["normalizer"]},
                        graph, is_training=True, mutable=["normalizer"],
                    )
                    nt = graph.x[:, 2].astype(jnp.int32)
                    return l2_loss(
                        tgt, out, nt, [NodeType.NORMAL, NodeType.OUTFLOW],
                        node_valid=graph.node_mask,
                    ), mut["normalizer"]

                (loss, norm), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state["params"])
                updates, opt = tx.update(
                    grads, state["opt_state"], state["params"]
                )
                return {
                    "params": optax.apply_updates(state["params"], updates),
                    "normalizer": norm,
                    "opt_state": opt,
                }, loss

            report = check_step_determinism(step, state, g, runs=2)
            if not report["deterministic"]:
                raise AssertionError(
                    f"step replay mismatches: {report['mismatches']}"
                )
            return "jitted train step replays bitwise"

        _check("train-step determinism", step_determinism, results)

    ok = all(results)
    print(("all checks passed" if ok else "CHECKS FAILED") +
          f" ({sum(results)}/{len(results)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
