"""Prediction CLI (reference ``graphphysics/predict.py``): load a checkpoint,
rollout every test trajectory, save predictions as XDMF time series."""

from __future__ import annotations

import argparse
import json
import sys

from graphphysics_tpu.dataset import GraphLoader
from graphphysics_tpu.training.parse_parameters import get_dataset, get_preprocessing
from graphphysics_tpu.training.trainer import Trainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict with a graphphysics_tpu model")
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--save_dir", default="predictions")
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--no_edge_feature", action="store_true")
    p.add_argument("--max_trajectories", type=int, default=None)
    p.add_argument("--external_features", default=None,
                   choices=[None, "aneurysm", "bezier"])
    p.add_argument("--graph_partition", type=int, default=0,
                   help="rollout each trajectory edge-partitioned into P "
                        "blocks across a graph mesh axis (for meshes whose "
                        "eval forward doesn't fit one chip)")
    p.add_argument("--partition_mode", default="halo",
                   choices=["halo", "gather"])
    p.add_argument("--partition_reorder", default=None,
                   choices=["rcm", "bfs", "hilbert", "none"])
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persist XLA executables here: repeated predict runs "
                        "skip the multi-minute rollout-scan compiles")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.compilation_cache_dir:
        from graphphysics_tpu.utils.compilation_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache_dir)
    with open(args.training_parameters_path) as fp:
        parameters = json.load(fp)

    from graphphysics_tpu.cli.train import _extra_features

    use_edge_feature = not args.no_edge_feature
    pre = get_preprocessing(
        parameters,
        use_edge_feature=use_edge_feature,
        remove_noise=True,
        extra_node_features=_extra_features(args.external_features),
    )
    ds = get_dataset(
        parameters,
        pre,
        use_edge_feature=use_edge_feature,
        use_previous_data=args.use_previous_data,
        switch_to_val=True,
    )

    prev_kwargs = {}
    if args.use_previous_data:
        prev_kwargs = dict(
            use_previous_data=True,
            previous_data_start=args.previous_data_start,
            previous_data_end=args.previous_data_end,
        )
    if args.graph_partition:
        prev_kwargs.update(
            graph_partition=args.graph_partition,
            partition_mode=args.partition_mode,
            partition_reorder=args.partition_reorder,
            partitioned_validation=True,
        )
    elif args.partition_mode != "halo" or args.partition_reorder:
        # silently ignoring these would let the user believe their rollout
        # ran partitioned/reordered when it did not
        raise SystemExit(
            "--partition_mode/--partition_reorder require --graph_partition"
        )
    trainer = Trainer(parameters, **prev_kwargs)
    # initialize state shapes from the first frame batch, then restore
    # (peek(): no producer thread/iterator leaked, matching grph-export)
    loader = GraphLoader(ds, batch_size=1, shuffle=False, prefetch=0)
    trainer.init_state(loader.peek(), num_steps=1)
    from graphphysics_tpu.training.checkpoint import load_checkpoint

    trainer.state = load_checkpoint(args.model_path, trainer.state)
    trainer.predict(ds, save_dir=args.save_dir, max_trajectories=args.max_trajectories)
    return 0


if __name__ == "__main__":
    sys.exit(main())
