"""Worker for the multi-host test: one of N processes, each owning 4 CPU
devices, training data-parallel over the GLOBAL 2x4-device mesh through the
real multihost utilities (``parallel/multihost.py``). Not collected by
pytest (underscore prefix) — launched as subprocesses by
``tests/test_multihost.py``.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

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
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from tests._multihost_common import make_graphs, make_setup

    mesh = Mesh(np.array(jax.devices()).reshape(4 * nproc), ("data",))
    graphs = make_graphs(4 * nproc)

    class ListDataset:
        def __len__(self):
            return len(graphs)

        def __getitem__(self, i):
            return graphs[i]

    loader = MultihostGraphLoader(
        ListDataset(), per_host_batch=4, mesh=mesh, shuffle=False
    )

    sim, tx, state, step = make_setup(mesh)
    losses = []
    for _ in range(2):
        for gb in loader:
            state, loss = step(state, gb)
            losses.append(float(loss))

    # edge-partitioned (halo) phase: ONE mesh graph partitioned over all 8
    # devices across both processes — per-layer halo all_to_all rides the
    # cross-process collectives
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tests._multihost_common import make_gp_setup, make_partitioned

    gmesh = Mesh(np.array(jax.devices()).reshape(4 * nproc), ("graph",))
    parts = make_partitioned(4 * nproc)
    lo, hi = pid * 4, (pid + 1) * 4
    sharding = NamedSharding(gmesh, P("graph"))
    gparts = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)[lo:hi]
        ),
        parts,
    )
    gstate, gstep = make_gp_setup(gmesh)
    gp_losses = []
    for _ in range(2):
        gstate, gloss = gstep(gstate, gparts)
        gp_losses.append(float(gloss))

    # size-bucketed phase: two size classes; the loader's globally-agreed
    # bucket schedule must give every host the same bucket (= static shape)
    # at every step without communication
    from tests._multihost_common import make_bucketed_dataset

    bds = make_bucketed_dataset()
    bloader = MultihostGraphLoader(
        bds, per_host_batch=8 // nproc, mesh=mesh, shuffle=True, seed=7
    )
    _, _, bstate, bstep = make_setup(mesh)
    bucket_losses, bucket_dims = [], []
    for bb in bloader:
        bstate, bloss = bstep(bstate, bb)
        bucket_losses.append(float(bloss))
        bucket_dims.append(int(bb.x.shape[1]))

    # sharded validation phase: each process rolls out only its interleaved
    # trajectory share; the RMSE stats reduce across hosts inside validate()
    from tests._multihost_common import run_validation

    val_rmse, val_rolled = run_validation()

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": pid,
                "losses": losses,
                "gp_losses": gp_losses,
                "bucket_losses": bucket_losses,
                "bucket_dims": bucket_dims,
                "val_rmse": val_rmse,
                "val_rolled": val_rolled,
            },
            f,
        )
    print(f"[worker {pid}] losses={losses} gp={gp_losses} "
          f"buckets={bucket_dims} val={val_rmse:.6f} rolled={val_rolled}",
          flush=True)


if __name__ == "__main__":
    main()
