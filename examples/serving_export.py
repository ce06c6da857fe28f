"""Serving example: train briefly, export the eval step and the full
rollout as StableHLO artifacts, then serve a trajectory WITHOUT the model's
Python definitions.

The reference serves by re-instantiating its whole Python stack per process
(``graphphysics/predict.py:32-114``); here deployment is two files — the
one-frame step and/or the whole-trajectory rollout — loadable by any
JAX/PjRt runtime (``utils/export.py``):

    python examples/serving_export.py [--workdir DIR] [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import tempfile


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="serving_export_")
    os.makedirs(workdir, exist_ok=True)

    import jax
    import numpy as np

    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.rollout import rollout_rmse
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.export import (
        export_rollout,
        load_eval_step_file,
        load_rollout,
        save_eval_step,
    )
    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    # 1. tiny training run (cylinder.json schema, synthetic data)
    h5_path, meta_path = write_cylinder_h5(
        os.path.join(workdir, "data"), num_traj=2, steps=12, nx=12, ny=8
    )
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 4, "hidden_size": 32,
                  "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {
            "noise": 0.02, "noise_index_start": [0], "noise_index_end": [2],
            "masking": 0}},
    }
    ds = get_dataset(param, get_preprocessing(param))
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=20,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        metrics_path=os.path.join(workdir, "metrics.csv"), rollout_dir=None,
    )
    trainer.fit(GraphLoader(ds, batch_size=2, shuffle=True, prefetch=0),
                num_epochs=args.epochs)

    # 2. export: one-frame eval step + whole-trajectory rollout
    variables = {"params": trainer.state["params"],
                 "normalizer": trainer.state["normalizer"]}
    example = jax.tree_util.tree_map(lambda a: jax.numpy.asarray(a), ds[0])
    step_path = save_eval_step(
        os.path.join(workdir, "eval_step.stablehlo"), trainer.sim, variables,
        example,
    )
    frames = trainer._stacked_trajectory(ds, 0)
    frames = jax.tree_util.tree_map(jax.numpy.asarray, frames)
    rollout_blob = export_rollout(trainer.sim, variables, frames)
    ro_path = os.path.join(workdir, "rollout.stablehlo")
    with open(ro_path, "wb") as fp:
        fp.write(rollout_blob)
    print(f"exported: {step_path} ({os.path.getsize(step_path)} bytes), "
          f"{ro_path} ({os.path.getsize(ro_path)} bytes)")

    # 3. "serving process": load the artifacts and predict — no Simulator,
    #    no model classes, no config needed from here on
    step = load_eval_step_file(step_path)
    one_frame = np.asarray(step(example))
    with open(ro_path, "rb") as fp:
        run = load_rollout(fp.read())
    pred, tgt = run(frames)
    rmse = float(rollout_rmse(pred, tgt, frames.node_mask[0]))
    print(f"served one frame {one_frame.shape}; "
          f"served rollout {np.asarray(pred).shape}, rmse={rmse:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
