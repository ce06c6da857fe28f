"""Quickstart: train a MeshGraphNet-style model end-to-end on a synthetic
CylinderFlow-schema dataset, validate with autoregressive rollout, and write
predicted trajectories as XDMF time series.

Runs on CPU or a TPU chip — everything goes through the same public CLI the
reference exposes (``graphphysics/train.py`` / ``predict.py`` semantics):

    python examples/quickstart_cylinder.py [--workdir DIR] [--epochs N]

What it does:
1. generates a small synthetic cylinder dataset (h5 + meta.json, the exact
   CylinderFlow schema) with a train and a test split;
2. writes a training config (same JSON schema as ``training_config/*.json``);
3. trains with noise-injected one-step targets + rollout validation;
4. restores the best checkpoint and writes full predicted rollouts to
   ``<workdir>/predictions/*.xdmf`` (open in ParaView).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="quickstart_out")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--trajectories", type=int, default=3)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--grid", type=int, nargs=2, default=(16, 12),
                   metavar=("NX", "NY"))
    p.add_argument("--hidden_size", type=int, default=32)
    p.add_argument("--message_passing", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--data_parallel", action="store_true")
    args = p.parse_args()

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    # 1. synthetic dataset (train + test split; note: switch_to_val replaces
    #    "train" -> "test" in the h5 path, reference h5_dataset.py:40-41)
    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    data_dir = os.path.join(workdir, "data")
    h5_path, meta_path = write_cylinder_h5(
        data_dir, num_traj=args.trajectories, steps=args.steps,
        nx=args.grid[0], ny=args.grid[1],
    )
    shutil.copy(h5_path, os.path.join(data_dir, "test.h5"))
    print(f"[quickstart] dataset: {h5_path}")

    # 2. training config — same schema as training_config/cylinder.json
    config = {
        "dataset": {
            "extension": "h5",
            "h5_path": h5_path,
            "meta_path": meta_path,
            "khop": 1,
        },
        "model": {
            "type": "epd",
            "message_passing_num": args.message_passing,
            "hidden_size": args.hidden_size,
            "node_input_size": 2,
            "output_size": 2,
            "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 2,
            "output_index_start": 0,
            "output_index_end": 2,
            "node_type_index": 2,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.02,
                "noise_index_start": [0],
                "noise_index_end": [2],
                "masking": 0,
            },
            "world_pos_parameters": {"use": False},
        },
    }
    cfg_path = os.path.join(workdir, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)

    # 3. train (rollout-RMSE validation every epoch, checkpoints + metrics.csv)
    from graphphysics_tpu.cli.train import main as train_main

    train_args = [
        "--training_parameters_path", cfg_path,
        "--num_epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--warmup", "20",
        "--init_lr", "1e-3",
        "--val_trajectories", "1",
    ]
    if args.data_parallel:
        train_args.append("--data_parallel")
    rc = train_main(train_args)
    if rc != 0:
        return rc

    # 4. predict: full autoregressive rollouts for every test trajectory
    from graphphysics_tpu.cli.predict import main as predict_main

    rc = predict_main([
        "--training_parameters_path", cfg_path,
        "--model_path", os.path.join(workdir, "checkpoints", "state.msgpack"),
        "--save_dir", os.path.join(workdir, "predictions"),
    ])
    if rc != 0:
        return rc

    print(f"[quickstart] done. metrics: {workdir}/metrics.csv ; "
          f"rollouts: {workdir}/predictions/*.xdmf (open in ParaView)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
