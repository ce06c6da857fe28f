"""Training CLI (reference ``graphphysics/train.py``):

    python -m graphphysics_tpu.cli.train --training_parameters_path=cfg.json \
        --num_epochs 10 --batch_size 2 --init_lr 1e-3 --warmup 1000

Same JSON config schema and flag names as the reference; W&B is optional
(``--project_name`` with wandb installed), CSV metrics always written.
"""

from __future__ import annotations

import argparse
import json
import sys

from graphphysics_tpu.dataset import GraphLoader
from graphphysics_tpu.training.parse_parameters import get_dataset, get_preprocessing
from graphphysics_tpu.training.trainer import Trainer
from graphphysics_tpu.utils.metrics import WandbLogger


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a graphphysics_tpu model")
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--project_name", default=None, help="W&B project (optional)")
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--init_lr", type=float, default=0.001)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--prefetch_factor", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=0,
                   help="worker processes for item building (0 = in-process)")
    p.add_argument("--model_save_name", default="state.msgpack")
    p.add_argument("--model_path", default=None, help="checkpoint to resume from")
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--no_edge_feature", action="store_true")
    p.add_argument("--masking_ratio", type=float, default=None)
    p.add_argument("--val_trajectories", type=int, default=None)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--metrics_path", default="metrics.csv")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch across all local devices (shard_map)")
    p.add_argument("--gradient_accumulation", action="store_true",
                   help="one optimizer step per batch of batch_size "
                        "sequential microbatches (activation memory of one "
                        "microbatch; exact big-batch semantics)")
    p.add_argument("--graph_partition", type=int, default=0,
                   help="edge-partition every batch graph into P contiguous "
                        "node blocks across a graph mesh axis (per-layer "
                        "exchange rides ICI); combine with --data_parallel "
                        "for the 2-D (data x graph) pod layout")
    p.add_argument("--partition_mode", default="halo",
                   choices=["halo", "gather"],
                   help="per-layer exchange: all_to_all of boundary rows "
                        "(halo) or full-table all_gather")
    p.add_argument("--partition_edge_headroom", type=float, default=1.25,
                   help="static partition budgets = canonical-batch needs x "
                        "this factor; 1.0 is exact (and fastest) for "
                        "fixed-topology datasets — outlier batches grow the "
                        "budgets with one recompile instead of failing "
                        "(docs/scaling.md 'Projected ICI efficiency')")
    p.add_argument("--no_partition_budget_growth", action="store_true",
                   help="hard-error when a batch exceeds the static "
                        "partition budgets instead of growing them "
                        "(bit-identical padded shapes for replays)")
    p.add_argument("--partition_reorder", default=None,
                   choices=["rcm", "bfs", "hilbert", "none"],
                   help="locality-aware node reordering before the "
                        "contiguous partition cut (shrinks halo volume; "
                        "parallel/reorder.py)")
    p.add_argument("--no_partition_overlap_attention", action="store_true",
                   help="disable the split-edge [local | halo] layout that "
                        "lets the transformer's attention overlap the halo "
                        "all_to_all with local compute (exact-parity; on "
                        "by default for halo-mode transformer runs)")
    p.add_argument("--halo_dtype", default=None,
                   choices=["bf16", "f16", "none"],
                   help="wire dtype for the per-layer halo all_to_all "
                        "(bf16 halves the boundary-exchange bytes; local "
                        "math stays f32 — ops/halo.py)")
    p.add_argument("--partitioned_validation", action="store_true",
                   help="also run validation rollouts edge-partitioned over "
                        "the graph mesh (for meshes whose eval forward "
                        "doesn't fit one chip)")
    p.add_argument("--save_every_n_steps", type=int, default=None,
                   help="also checkpoint mid-epoch every N steps (preemption "
                        "safety; SIGTERM/SIGINT always checkpoint before exit)")
    p.add_argument("--checkpoint_backend", default="msgpack",
                   choices=["msgpack", "orbax", "orbax-async"],
                   help="orbax-async: periodic saves don't stall the step "
                        "loop; orbax coordinates multi-host sharded state")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of a few train steps "
                        "here (view with TensorBoard/xprof)")
    p.add_argument("--profile_start_step", type=int, default=10)
    p.add_argument("--profile_num_steps", type=int, default=3)
    p.add_argument("--progress", default="auto", choices=["auto", "on", "off"],
                   help="in-place per-epoch progress line (auto: TTY only)")
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persist XLA executables here: restarts/resumes skip "
                        "the multi-minute TPU compiles")
    p.add_argument(
        "--external_features",
        default=None,
        choices=[None, "aneurysm", "bezier"],
        help="extra node-feature hook (reference wires aneurysm at train.py:100-105)",
    )
    return p


def _extra_features(name):
    if name == "aneurysm":
        from graphphysics_tpu.external.aneurysm import build_features

        return build_features
    if name == "bezier":
        from graphphysics_tpu.external.bezier import add_bezier_node_type

        return add_bezier_node_type
    return None


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.compilation_cache_dir:
        from graphphysics_tpu.utils.compilation_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache_dir)
    with open(args.training_parameters_path) as fp:
        parameters = json.load(fp)

    use_edge_feature = not args.no_edge_feature
    extra = _extra_features(args.external_features)

    train_pre = get_preprocessing(
        parameters, use_edge_feature=use_edge_feature, extra_node_features=extra
    )
    val_pre = get_preprocessing(
        parameters,
        use_edge_feature=use_edge_feature,
        remove_noise=True,
        extra_node_features=extra,
    )
    train_ds = get_dataset(
        parameters,
        train_pre,
        masking_ratio=args.masking_ratio,
        use_edge_feature=use_edge_feature,
        use_previous_data=args.use_previous_data,
    )
    val_ds = get_dataset(
        parameters,
        val_pre,
        use_edge_feature=use_edge_feature,
        use_previous_data=args.use_previous_data,
        switch_to_val=True,
        edge_layout=train_ds.edge_layout,
    )
    # unify static shapes to the max over BOTH splits (a val trajectory may
    # be larger than every train trajectory); budgets materialize lazily, so
    # touch one item of each first. Size-bucketed datasets skip this: every
    # trajectory pads to its own bucket, so no split can exceed a budget.
    _ = train_ds[0]
    _ = val_ds[0]
    if train_ds.num_buckets <= 1 and val_ds.num_buckets <= 1:
        nb = max(train_ds.node_budget, val_ds.node_budget)
        eb = None
        if train_ds.edge_budget or val_ds.edge_budget:
            eb = max(train_ds.edge_budget or 0, val_ds.edge_budget or 0)
        train_ds.node_budget = val_ds.node_budget = nb
        train_ds.edge_budget = val_ds.edge_budget = eb
        if train_ds.ell_degree or val_ds.ell_degree:
            d = max(train_ds.ell_degree or 0, val_ds.ell_degree or 0)
            train_ds.ell_degree = val_ds.ell_degree = d
        if train_ds.edge_layout == "csr" or val_ds.edge_layout == "csr":
            # the per-split chunk budgets were fixed under pre-unification
            # node/edge budgets; re-derive them under the unified shapes,
            # then share the max so both splits pad identically
            train_ds.csr_max_chunks = val_ds.csr_max_chunks = None
            _ = train_ds[0]
            _ = val_ds[0]
            mc = max(train_ds.csr_max_chunks or 0, val_ds.csr_max_chunks or 0)
            train_ds.csr_max_chunks = val_ds.csr_max_chunks = mc
    loader = GraphLoader(
        train_ds,
        batch_size=args.batch_size,
        shuffle=True,
        seed=args.seed,
        prefetch=args.prefetch_factor,
        num_workers=args.num_workers,
        collate="stack"
        if (args.data_parallel or args.gradient_accumulation)
        else "concat",
    )

    extra_logger = None
    if args.project_name:
        # resume the same W&B run when resuming training (the reference
        # persists the run id in its checkpoints, lightning_module.py:353-366;
        # ours lives in the checkpoint metadata sidecar)
        run_id = None
        if args.resume_training and args.model_path:
            from graphphysics_tpu.training.checkpoint import load_metadata

            # advisory read before the trainer's single-parse resume —
            # the sidecar spares deserializing the full state twice
            run_id = load_metadata(
                args.model_path, prefer_sidecar=True
            ).get("wandb_run_id")
        extra_logger = WandbLogger(
            run_id=run_id,
            project=args.project_name,
            config={
                "architecture": parameters["model"]["type"],
                "#_layers": parameters["model"]["message_passing_num"],
                "#_neurons": parameters["model"]["hidden_size"],
                "#_hops": parameters["dataset"].get("khop", 1),
                "max_lr": args.init_lr,
                "batch_size": args.batch_size,
            },
        )

    prev_kwargs = {}
    if args.use_previous_data:
        prev_kwargs = dict(
            use_previous_data=True,
            previous_data_start=args.previous_data_start,
            previous_data_end=args.previous_data_end,
        )
    trainer = Trainer(
        parameters,
        data_parallel=args.data_parallel,
        gradient_accumulation=args.gradient_accumulation,
        graph_partition=args.graph_partition,
        partition_mode=args.partition_mode,
        partition_edge_headroom=args.partition_edge_headroom,
        partition_budget_growth=not args.no_partition_budget_growth,
        partition_reorder=args.partition_reorder,
        partition_overlap_attention=not args.no_partition_overlap_attention,
        halo_dtype=args.halo_dtype,
        partitioned_validation=args.partitioned_validation,
        learning_rate=args.init_lr,
        warmup=args.warmup,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_name=args.model_save_name,
        metrics_path=args.metrics_path,
        seed=args.seed,
        extra_logger=extra_logger,
        save_every_n_steps=args.save_every_n_steps,
        checkpoint_backend=args.checkpoint_backend,
        profile_dir=args.profile_dir,
        profile_start_step=args.profile_start_step,
        profile_num_steps=args.profile_num_steps,
        progress={"auto": None, "on": True, "off": False}[args.progress],
        **prev_kwargs,
    )
    trainer.fit(
        loader,
        val_dataset=val_ds,
        num_epochs=args.num_epochs,
        resume_from=args.model_path if args.resume_training else None,
        val_trajectories=args.val_trajectories,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
