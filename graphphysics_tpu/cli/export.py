"""Export CLI: checkpoint -> AOT StableHLO serving artifacts.

The TPU-idiomatic deployment step the reference lacks (its serving path
re-loads the full Python stack per prediction, ``graphphysics/predict.py:
32-114``): one command turns a trained checkpoint into self-contained
serving blobs — the one-frame eval forward and, optionally, the
whole-trajectory autoregressive rollout scan — with the trained params and
normalizer statistics baked in (``utils/export.py``). Any JAX process (or a
PjRt C++ runtime) deserializes and calls them without the model's Python
definitions, configs, or checkpoint code.

Shapes are static: one artifact per (bucket shape[, trajectory length]).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export AOT serving artifacts from a checkpoint"
    )
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--output_dir", default="exported")
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--no_edge_feature", action="store_true")
    p.add_argument("--external_features", default=None,
                   choices=[None, "aneurysm", "bezier"])
    p.add_argument("--rollout", action="store_true",
                   help="also export the whole-trajectory rollout scan "
                        "(one artifact per trajectory length)")
    p.add_argument("--graph_partition", type=int, default=0,
                   help="also export the EDGE-PARTITIONED eval forward over "
                        "a P-device graph mesh (halo collectives inside; "
                        "serving for meshes past one chip's HBM)")
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering platforms (e.g. tpu,cpu); "
                        "default: the current backend")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    with open(args.training_parameters_path) as fp:
        parameters = json.load(fp)

    import jax

    from graphphysics_tpu.cli.train import _extra_features
    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.checkpoint import load_checkpoint
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.export import export_eval_step, export_rollout

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
    trainer = Trainer(parameters, **prev_kwargs)
    loader = GraphLoader(ds, batch_size=1, shuffle=False, prefetch=0)
    example = loader.peek()
    trainer.init_state(example, num_steps=1)
    trainer.state = load_checkpoint(args.model_path, trainer.state)
    variables = {
        "params": trainer.state["params"],
        "normalizer": trainer.state["normalizer"],
    }
    platforms = args.platforms.split(",") if args.platforms else None

    os.makedirs(args.output_dir, exist_ok=True)
    eval_path = os.path.join(args.output_dir, "eval_step.stablehlo")
    blob = export_eval_step(
        trainer.sim, variables, example, platforms=platforms
    )
    with open(eval_path, "wb") as fp:
        fp.write(blob)
    print(f"[export] eval step -> {eval_path} ({len(blob)} bytes, "
          f"{example.num_nodes} nodes / {example.num_edges} edges)")

    if args.graph_partition:
        from graphphysics_tpu.parallel import make_mesh
        from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
        from graphphysics_tpu.utils.export import (
            export_partitioned_eval_step,
        )
        import numpy as np

        ptrainer = Trainer(
            parameters, graph_partition=args.graph_partition, **prev_kwargs
        )
        ptrainer.sim = trainer.sim
        parts = ptrainer._partition_graph(
            jax.tree_util.tree_map(np.asarray, example)
        )
        pmesh = make_mesh(args.graph_partition, (GRAPH_AXIS,))
        part_path = os.path.join(
            args.output_dir, f"eval_step_p{args.graph_partition}.stablehlo"
        )
        blob = export_partitioned_eval_step(
            trainer.sim, variables,
            jax.tree_util.tree_map(np.asarray, parts), pmesh,
            platforms=platforms,
        )
        with open(part_path, "wb") as fp:
            fp.write(blob)
        print(f"[export] partitioned eval (P={args.graph_partition}) -> "
              f"{part_path} ({len(blob)} bytes)")

    if args.rollout:
        frames = trainer._stacked_trajectory(ds, 0)
        roll_path = os.path.join(args.output_dir, "rollout.stablehlo")
        blob = export_rollout(
            trainer.sim,
            variables,
            frames,
            platforms=platforms,
            **(
                dict(
                    use_previous_data=True,
                    previous_data_start=args.previous_data_start,
                    previous_data_end=args.previous_data_end,
                )
                if args.use_previous_data
                else {}
            ),
        )
        with open(roll_path, "wb") as fp:
            fp.write(blob)
        t = len(ds.trajectory_indices(0))
        print(f"[export] rollout -> {roll_path} ({len(blob)} bytes, "
              f"T={t})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
