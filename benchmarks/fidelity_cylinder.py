"""CylinderFlow-family fidelity run: train the flagship MeshGraphNet
(``training_config/cylinder.json`` schema — EPD 15x128, h5, Cartesian+
Distance edge features, noise on the velocity inputs) on the synthetic
vortex-advection cylinder dataset and track the autoregressive
``val_all_rollout_rmse`` per epoch.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fidelity_cylinder.py

Record the result in BASELINE.json ``measured.fidelity_cylinder_synth``.
"""

import argparse
import json
import os
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--trajectories", type=int, default=4)
    p.add_argument("--val_trajectories", type=int, default=2)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--nx", type=int, default=24)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--hidden_size", type=int, default=128)
    p.add_argument("--message_passing", type=int, default=15)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--workdir", default=None)
    p.add_argument("--graph_partition", type=int, default=0,
                   help="train edge-partitioned over a P-device graph mesh "
                        "(halo mode, GraphNetBlock overlap_exchange ON)")
    p.add_argument("--halo_dtype", default=None, choices=["bf16", "f16"],
                   help="16-bit halo wire (with --graph_partition)")
    args = p.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="cylinder_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    from _common import (
        persistence_rmse,
        unify_budgets,
        val_param_for,
        write_heldout_split,
    )

    data_dir = os.path.join(workdir, "data")
    h5_path, meta_path = write_cylinder_h5(
        data_dir, num_traj=args.trajectories, steps=args.steps,
        nx=args.nx, ny=args.ny,
    )
    test_dir = write_heldout_split(
        write_cylinder_h5, data_dir, os.path.join(workdir, "testdata"),
        num_traj=args.val_trajectories, steps=args.steps,
        nx=args.nx, ny=args.ny, seed=12345,
    )
    val_h5_path = os.path.join(test_dir, "train.h5")

    # cylinder.json schema: EPD 15x128, inputs = velocity(2), 3-dim edge
    # features (relative pos + norm), node type at column 2
    param = {
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

    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(val_param_for(param, val_h5_path), val_pre)
    unify_budgets(train_ds, val_ds)

    loader = GraphLoader(
        train_ds, batch_size=args.batch_size, shuffle=True, prefetch=0
    )

    trainer = Trainer(
        param,
        learning_rate=1e-3,
        warmup=200,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        metrics_path=os.path.join(workdir, "metrics.csv"),
        rollout_dir=None,
        log_every=50,
        graph_partition=args.graph_partition,
        halo_dtype=args.halo_dtype,
    )

    # context baseline: velocity frozen at each trajectory's first frame,
    # clamped/averaged with the real rollout metric's semantics
    baseline = persistence_rmse(val_ds, (0, 2), node_type_col=2)
    print(f"persistence (frozen-velocity) rollout RMSE: {baseline:.6f}")

    t0 = time.time()
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=args.epochs)
    minutes = (time.time() - t0) / 60

    out = {
        "val_all_rollout_rmse_by_epoch": [float(v) for v in history["val_rmse"]],
        "persistence_rmse": baseline,
        "epochs": args.epochs,
        "minutes": round(minutes, 1),
        "workdir": workdir,
        "graph_partition": args.graph_partition,
        "halo_dtype": args.halo_dtype,
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
