"""DeformingPlate-family fidelity run: train the plate transformer (world
edges + obstacle-displacement features, ``training_config/plate.json``
schema) on the synthetic press dataset and track the autoregressive
``val_all_rollout_rmse`` per epoch.

This exercises the full world-edge pipeline end-to-end — FaceToEdge mesh
edges + cKDTree world edges, ``add_obstacles_next_pos`` input features,
world-pos edge features, delta targets on ``target_features: ["world_pos"]``
(reference ``preprocessing.py:49-174``, ``lightning_module.py:242-257``).

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fidelity_plate.py

Record the result in BASELINE.json ``measured.fidelity_plate_press``.
"""

import argparse
import json
import os
import tempfile
import time



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--trajectories", type=int, default=6)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--nx", type=int, default=12)
    p.add_argument("--nz", type=int, default=4)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--message_passing", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="plate_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_plate_press_h5

    from _common import (
        persistence_rmse,
        unify_budgets,
        val_param_for,
        write_heldout_split,
    )

    data_dir = os.path.join(workdir, "data")
    h5_path, meta_path = write_plate_press_h5(
        data_dir, num_traj=args.trajectories, steps=args.steps,
        nx=args.nx, nz=args.nz,
    )
    # held-out rollout trajectories (different seed -> different punch
    # centers/speeds)
    test_dir = write_heldout_split(
        write_plate_press_h5, data_dir, os.path.join(workdir, "testdata"),
        num_traj=2, steps=args.steps, nx=args.nx, nz=args.nz, seed=12345,
    )
    val_h5_path = os.path.join(test_dir, "train.h5")

    param = {
        "dataset": {
            "extension": "h5",
            "h5_path": h5_path,
            "meta_path": meta_path,
            "khop": 1,
        },
        "model": {
            "type": "transformer",
            "message_passing_num": args.message_passing,
            "hidden_size": args.hidden_size,
            "node_input_size": 6,
            "edge_input_size": 0,
            "output_size": 3,
            "num_heads": 4,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 6,
            "output_index_start": 0,
            "output_index_end": 3,
            "node_type_index": 6,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.003,
                "noise_index_start": [0],
                "noise_index_end": [3],
                "masking": 0,
            },
            "world_pos_parameters": {
                "use": True,
                "world_pos_index_start": 0,
                "world_pos_index_end": 3,
                "radius": 0.08,
            },
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
    )

    # context baseline: a frozen plate (zero world_pos delta every step),
    # clamped/averaged with the real rollout metric's semantics
    baseline = persistence_rmse(val_ds, (0, 3), node_type_col=6)
    print(f"persistence (zero-delta) rollout RMSE: {baseline:.6f}")

    t0 = time.time()
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=args.epochs)
    minutes = (time.time() - t0) / 60

    out = {
        "val_all_rollout_rmse_by_epoch": [float(v) for v in history["val_rmse"]],
        "persistence_rmse": baseline,
        "epochs": args.epochs,
        "minutes": round(minutes, 1),
        "workdir": workdir,
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
