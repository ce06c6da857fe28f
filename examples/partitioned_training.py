"""Scale-out example: train with the graph edge-partitioned across devices.

The TPU answer to "my mesh doesn't fit one chip" (the reference is strictly
single-device, SURVEY.md §2.4): every batch graph splits into contiguous
node blocks over a ``graph`` mesh axis, the per-layer halo exchange rides
ICI, and — optionally — validation rollouts run partitioned too.

    python examples/partitioned_training.py [--workdir DIR] [--parts P]

With no TPU attached it simulates ``--parts`` devices on CPU (the env vars
must be set before jax initializes, which this script does for you —
existing ``JAX_PLATFORMS``/``XLA_FLAGS`` values are honored, so run with
``JAX_PLATFORMS=cpu`` if your environment pins a device plugin).
Everything goes through the same public CLI as the quickstart; the only
additions are ``--graph_partition`` / ``--partition_mode`` /
``--partitioned_validation``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="partitioned_out")
    p.add_argument("--parts", type=int, default=4)
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    # simulate a multi-device host if none is attached (must precede jax init)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={args.parts}"
    )

    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    h5_path, meta_path = write_cylinder_h5(wd, num_traj=2, steps=12, nx=12, ny=8)
    shutil.copy(h5_path, os.path.join(wd, "test.h5"))

    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 4, "hidden_size": 32,
                  "node_input_size": 2, "edge_input_size": 3,
                  "output_size": 2, "num_heads": 4},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {
            "noise": 0.02, "noise_index_start": [0], "noise_index_end": [2]}},
    }
    cfg = os.path.join(wd, "config.json")
    with open(cfg, "w") as f:
        json.dump(param, f, indent=2)

    from graphphysics_tpu.cli.train import main as train_main

    return train_main([
        "--training_parameters_path", cfg,
        "--num_epochs", str(args.epochs),
        "--batch_size", "2",
        "--warmup", "10",
        "--graph_partition", str(args.parts),
        "--partition_mode", "halo",
        "--partitioned_validation",
        "--checkpoint_dir", os.path.join(wd, "checkpoints"),
        "--metrics_path", os.path.join(wd, "metrics.csv"),
    ])


if __name__ == "__main__":
    raise SystemExit(main())
