"""TRUE multi-host convergence run (VERDICT r4 item 3b): two
``jax.distributed`` processes (4 CPU devices each) train the cylinder
fidelity config END-TO-END through ``Trainer(data_parallel=True)`` +
``MultihostGraphLoader`` + sharded multi-host validation, and the final
rollout RMSE must land within noise of the single-process record
(``BASELINE.json fidelity_cylinder_synth_harness``: 0.0123).

The reference is strictly single-device (`graphphysics/train.py:233-236`
— SURVEY §2.4); this exercises the framework's multi-host path on the only
multi-"host" topology this environment offers (2 processes on one machine,
DCN-less). Both processes generate the SAME synthetic dataset (seeded), so
no shared filesystem coordination is needed.

    PYTHONPATH=/root/repo python benchmarks/fidelity_multihost.py --epochs 12
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

WORKER = "__fidelity_multihost_worker__"


def worker_main():
    pid = int(os.environ["MH_PID"])
    nproc = int(os.environ["MH_NPROC"])
    port = os.environ["MH_PORT"]
    epochs = int(os.environ["MH_EPOCHS"])
    per_host_batch = int(os.environ.get("MH_PER_HOST_BATCH", "4"))
    workdir = os.environ["MH_WORKDIR"]

    import jax

    from graphphysics_tpu.parallel.multihost import (
        MultihostGraphLoader,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc

    import numpy as np

    from graphphysics_tpu.core.graph import stack_graphs
    from graphphysics_tpu.dataset import GraphLoader  # noqa: F401
    from graphphysics_tpu.parallel import make_mesh
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from graphphysics_tpu.utils.synthetic import write_cylinder_h5

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _common import unify_budgets, val_param_for, write_heldout_split

    # both processes write the same deterministic dataset locally
    data_dir = os.path.join(workdir, f"data_p{pid}")
    h5_path, meta_path = write_cylinder_h5(
        data_dir, num_traj=4, steps=50, nx=24, ny=16
    )
    test_dir = write_heldout_split(
        write_cylinder_h5, data_dir, os.path.join(workdir, f"test_p{pid}"),
        num_traj=2, steps=50, nx=24, ny=16, seed=12345,
    )
    val_h5_path = os.path.join(test_dir, "train.h5")

    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "epd", "message_passing_num": 15,
                  "hidden_size": 128, "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0.02,
                                              "noise_index_start": [0],
                                              "noise_index_end": [2],
                                              "masking": 0},
                            "world_pos_parameters": {"use": False}},
    }
    train_pre = get_preprocessing(param)
    val_pre = get_preprocessing(param, remove_noise=True)
    train_ds = get_dataset(param, train_pre)
    val_ds = get_dataset(val_param_for(param, val_h5_path), val_pre)
    unify_budgets(train_ds, val_ds)

    mesh = make_mesh(jax.device_count())
    loader = MultihostGraphLoader(
        train_ds, per_host_batch=per_host_batch, mesh=mesh, shuffle=True,
        seed=42,
    )
    trainer = Trainer(
        param, learning_rate=1e-3, warmup=200,
        data_parallel=True,
        checkpoint_dir=os.path.join(workdir, f"ckpt_p{pid}"),
        metrics_path=None, rollout_dir=None, log_every=100,
    )
    # init from a HOST-LOCAL stacked example: the loader's peek() is a
    # global sharded array whose row 0 is only addressable on process 0
    example = stack_graphs(
        [train_ds[i] for i in range(max(per_host_batch, 1))]
    )
    trainer.init_state(example, num_steps=epochs * len(loader))

    t0 = time.time()
    history = trainer.fit(loader, val_dataset=val_ds, num_epochs=epochs)
    out = {
        "pid": pid,
        "train_loss": [float(v) for v in history["train_loss"]],
        "val_rmse": [float(v) for v in history["val_rmse"]],
        "minutes": round((time.time() - t0) / 60, 1),
    }
    with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=12377)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--devices_per_host", type=int, default=4)
    ap.add_argument("--per_host_batch", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=6000)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="mh_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    env_base = dict(os.environ)
    # strip the axon plugin: its sitecustomize pins the TPU platform at
    # interpreter startup and hangs in wedged windows (CLAUDE.md)
    env_base["PYTHONPATH"] = ":".join(
        p for p in env_base.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p
    ) or "/root/repo"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_host}"
    )

    procs = []
    for pid in range(args.nproc):
        env = dict(env_base)
        env.update({
            "MH_PID": str(pid), "MH_NPROC": str(args.nproc),
            "MH_PORT": str(args.port), "MH_EPOCHS": str(args.epochs),
            "MH_PER_HOST_BATCH": str(args.per_host_batch),
            "MH_WORKDIR": workdir, "MH_ROLE": WORKER,
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    results = []
    for pid in range(args.nproc):
        path = os.path.join(workdir, f"result_p{pid}.json")
        if os.path.exists(path):
            with open(path) as f:
                results.append(json.load(f))
        else:
            print(f"--- worker {pid} output tail ---")
            print("\n".join(outs[pid].splitlines()[-30:]))
            raise SystemExit(f"worker {pid} produced no result")

    # both processes must agree bit-for-bit on the replicated history
    import numpy as np

    np.testing.assert_allclose(
        results[0]["val_rmse"], results[1]["val_rmse"], rtol=1e-6
    )
    summary = {
        "nproc": args.nproc,
        "devices_per_host": args.devices_per_host,
        "per_host_batch": args.per_host_batch,
        "epochs": args.epochs,
        "val_all_rollout_rmse_by_epoch": results[0]["val_rmse"],
        "train_loss_by_epoch": results[0]["train_loss"],
        "minutes": results[0]["minutes"],
        "workdir": workdir,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    if os.environ.get("MH_ROLE") == WORKER:
        worker_main()
    else:
        main()
