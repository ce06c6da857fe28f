"""Panels-family fidelity run: train the panels transformer
(``training_config/panels.json`` schema — 15x128, node types read directly
from the static ``NodeTypeCoarse`` field at ``node_type_index: 3``) on the
synthetic 2D panel-obstructed flow and track the autoregressive
``val_all_rollout_rmse`` per epoch.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fidelity_panels.py

Record the result in BASELINE.json ``measured.fidelity_panels_synth``.
"""

import argparse
import json
import os
import tempfile
import time



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--trajectories", type=int, default=4)
    p.add_argument("--val_trajectories", type=int, default=2)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--nx", type=int, default=24)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--hidden_size", type=int, default=128)
    p.add_argument("--message_passing", type=int, default=15)
    p.add_argument("--khop", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="panels_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_panels_xdmf

    from _common import (
        persistence_rmse,
        unify_budgets,
        val_param_for,
        write_heldout_split,
    )

    train_dir = os.path.join(workdir, "dataset", "train")
    _, meta_path = write_panels_xdmf(
        train_dir, num_traj=args.trajectories, steps=args.steps,
        nx=args.nx, ny=args.ny, seed=0,
    )
    test_dir = write_heldout_split(
        write_panels_xdmf, train_dir,
        os.path.join(workdir, "dataset", "test"),
        num_traj=args.val_trajectories, steps=args.steps,
        nx=args.nx, ny=args.ny, seed=12345,
    )

    # panels.json schema: transformer 15x128, inputs = (vx, vy), outputs =
    # full 3-component Vitesse, node type at column 3
    param = {
        "dataset": {
            "extension": "xdmf",
            "xdmf_folder": train_dir,
            "meta_path": meta_path,
            "khop": args.khop,
            "new_edges_ratio": 0,
        },
        "model": {
            "type": "transformer",
            "message_passing_num": args.message_passing,
            "hidden_size": args.hidden_size,
            "node_input_size": 2,
            "edge_input_size": 0,
            "output_size": 3,
            "num_heads": 4,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 2,
            "output_index_start": 0,
            "output_index_end": 3,
            "node_type_index": 3,
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

    train_pre = get_preprocessing(param, use_edge_feature=False)
    val_pre = get_preprocessing(param, use_edge_feature=False, remove_noise=True)
    train_ds = get_dataset(param, train_pre, use_edge_feature=False)
    val_ds = get_dataset(
        val_param_for(param, test_dir), val_pre, use_edge_feature=False
    )
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

    # context baseline: velocity frozen at each trajectory's first frame,
    # clamped/averaged with the real rollout metric's semantics
    baseline = persistence_rmse(val_ds, (0, 3), node_type_col=3)
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
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
