"""3D-Aneurysm-family fidelity run: train the aneurysm transformer
(``training_config/coarse-aneurysm.json`` schema — external feature hook +
previous-data rollout feedback) on the synthetic tetra xdmf dataset and
track the autoregressive ``val_all_rollout_rmse`` per epoch.

This exercises the full aneurysm pipeline end-to-end — tetra→face→edge
topology, the ``external/aneurysm.py`` feature builder (node types from the
wall mask + inflow/outflow plane, acceleration from
``previous_data["Vitesse"]``, global inflow next-acceleration stats,
reference ``external/aneurysm.py:27-64``), and the rollout's derived-feature
feedback (``predicted − current`` written into the acceleration slice,
reference ``lightning_module.py:168-202``).

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fidelity_aneurysm.py

Record the result in BASELINE.json ``measured.fidelity_aneurysm_synth``.
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
    p.add_argument("--n", type=int, default=6, help="tet-grid resolution (n^3 nodes)")
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--message_passing", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--edge_layout", default="coo",
                   choices=["coo", "csr", "auto"],
                   help="csr routes attention through the fused Pallas "
                        "kernel — end-to-end convergence via the kernel")
    p.add_argument("--gmm", action="store_true",
                   help="GMM K=3 head + NLL loss (c-a-gmm.json family)")
    p.add_argument("--graph_partition", type=int, default=0,
                   help="train edge-partitioned over a P-device graph mesh "
                        "(halo exchange) — the end-to-end convergence check "
                        "for the partitioned trainer")
    p.add_argument("--halo_dtype", default=None, choices=["bf16", "f16"],
                   help="16-bit halo wire (with --graph_partition)")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="aneurysm_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.external.aneurysm import build_features
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_aneurysm_xdmf

    from _common import (
        persistence_rmse,
        unify_budgets,
        val_param_for,
        write_heldout_split,
    )

    train_dir = os.path.join(workdir, "dataset", "train")
    _, meta_path = write_aneurysm_xdmf(
        train_dir, num_traj=args.trajectories, steps=args.steps, n=args.n,
        seed=0,
    )
    # held-out rollout trajectories: distinct random wave phases/amplitudes
    test_dir = write_heldout_split(
        write_aneurysm_xdmf, train_dir,
        os.path.join(workdir, "dataset", "test"),
        num_traj=args.val_trajectories, steps=args.steps, n=args.n,
        seed=12345,
    )

    model = {
        "type": "transformer",
        "message_passing_num": args.message_passing,
        "hidden_size": args.hidden_size,
        "node_input_size": 14,
        "edge_input_size": 0,
        "output_size": 3,
        "num_heads": 4,
    }
    if args.gmm:
        model["num_mixture_components"] = 3
        model["temperature"] = 1
    param = {
        "dataset": {
            "extension": "xdmf",
            "xdmf_folder": train_dir,
            "meta_path": meta_path,
            "khop": 1,
            "new_edges_ratio": 0,
            "edge_layout": args.edge_layout,
        },
        "model": model,
        # x layout after the hook: [Vitesse(3), wall(1), time(1), accel(3),
        # pos(3), inflow-accel mean/min/max(3), node_type] — 14 features +
        # node type at 14 (same as coarse-aneurysm.json)
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 14,
            "output_index_start": 0,
            "output_index_end": 3,
            "node_type_index": 14,
        },
        # noise on velocity + acceleration, scaled to the synthetic O(1)
        # field (the reference configs' 10.0 values are for real-data units)
        "transformations": {
            "preprocessing": {
                "noise": [0.02, 0.02, 0.02, 0.01, 0.01, 0.01],
                "noise_index_start": [0, 1, 2, 5, 6, 7],
                "noise_index_end": [1, 2, 3, 6, 7, 8],
                "masking": 0,
            },
            "world_pos_parameters": {"use": False},
        },
    }

    train_pre = get_preprocessing(
        param, use_edge_feature=False, extra_node_features=build_features
    )
    val_pre = get_preprocessing(
        param, use_edge_feature=False, remove_noise=True,
        extra_node_features=build_features,
    )
    train_ds = get_dataset(
        param, train_pre, use_edge_feature=False, use_previous_data=True
    )
    val_ds = get_dataset(
        val_param_for(param, test_dir), val_pre, use_edge_feature=False,
        use_previous_data=True,
    )
    unify_budgets(train_ds, val_ds)

    loader = GraphLoader(
        train_ds, batch_size=args.batch_size, shuffle=True, prefetch=0
    )

    trainer = Trainer(
        param,
        learning_rate=1e-3,
        warmup=200,
        use_previous_data=True,
        previous_data_start=5,
        previous_data_end=8,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        metrics_path=os.path.join(workdir, "metrics.csv"),
        rollout_dir=None,
        log_every=50,
        graph_partition=args.graph_partition,
        halo_dtype=args.halo_dtype,
    )

    # context baseline: velocity frozen at each trajectory's first frame,
    # clamped/averaged with the real rollout metric's semantics
    baseline = persistence_rmse(val_ds, (0, 3), node_type_col=14)
    print(f"persistence (frozen-velocity) rollout RMSE: {baseline:.6f}")

    t0 = time.time()
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=args.epochs)
    minutes = (time.time() - t0) / 60

    out = {
        "val_all_rollout_rmse_by_epoch": [float(v) for v in history["val_rmse"]],
        "persistence_rmse": baseline,
        "epochs": args.epochs,
        "minutes": round(minutes, 1),
        "gmm": bool(args.gmm),
        "graph_partition": args.graph_partition,
        "halo_dtype": args.halo_dtype,
        "workdir": workdir,
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
