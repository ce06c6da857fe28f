"""REAL multi-host training test: two separate processes (4 CPU devices
each) initialize ``jax.distributed``, build the global 8-device mesh, shard
input per host through ``MultihostGraphLoader``, and run the DP train step
with cross-process Gloo collectives — then the result is compared against
the identical single-process 8-device run. This covers the multi-host path
(SURVEY.md §2.4 item 3) the reference has no analog of, without TPU pod
hardware."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS before importing jax
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    outs = [str(tmp_path / f"proc{p}.json") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), "2", str(port), outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    # both hosts observe the same global psum-reduced losses
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["gp_losses"], results[1]["gp_losses"],
                               rtol=1e-6)

    # single-process 8-device reference on the same data, same GLOBAL batch
    # order (process-major interleave: host p contributes indices [p::2])
    import jax

    from graphphysics_tpu.core.graph import stack_graphs
    from graphphysics_tpu.parallel import make_mesh, shard_batch
    from tests._multihost_common import make_graphs, make_setup

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    graphs = make_graphs(8)
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    batch = shard_batch(stack_graphs([graphs[i] for i in order]), mesh)
    _, _, state, step = make_setup(mesh)
    ref_losses = []
    for _ in range(2):
        state, loss = step(state, batch)
        ref_losses.append(float(loss))

    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=2e-5)

    # edge-partitioned (halo) reference: same partitioned graph on the
    # single-process 8-device mesh
    from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
    from tests._multihost_common import make_gp_setup, make_partitioned

    gmesh = make_mesh(8, (GRAPH_AXIS,))
    gparts = shard_batch(make_partitioned(8), gmesh, GRAPH_AXIS)
    gstate, gstep = make_gp_setup(gmesh, GRAPH_AXIS)
    gp_ref = []
    for _ in range(2):
        gstate, gloss = gstep(gstate, gparts)
        gp_ref.append(float(gloss))
    np.testing.assert_allclose(results[0]["gp_losses"], gp_ref, rtol=2e-5)

    # bucketed leg: both hosts follow the same globally-agreed bucket
    # schedule (same shape at every step) and match the single-process run
    # with the same global batch size (8 = 2 hosts x 4)
    assert results[0]["bucket_dims"] == results[1]["bucket_dims"]
    assert sorted(set(results[0]["bucket_dims"])) == [128, 256]
    np.testing.assert_allclose(
        results[0]["bucket_losses"], results[1]["bucket_losses"], rtol=1e-6
    )
    from graphphysics_tpu.parallel.multihost import MultihostGraphLoader
    from tests._multihost_common import make_bucketed_dataset

    bloader = MultihostGraphLoader(
        make_bucketed_dataset(), per_host_batch=8, mesh=mesh, shuffle=True,
        seed=7,
    )
    _, _, bstate, bstep = make_setup(mesh)
    bref, bdims = [], []
    for bb in bloader:
        bstate, bloss = bstep(bstate, bb)
        bref.append(float(bloss))
        bdims.append(int(bb.x.shape[1]))
    assert bdims == results[0]["bucket_dims"]
    np.testing.assert_allclose(results[0]["bucket_losses"], bref, rtol=2e-5)

    # sharded-validation leg: each host rolled out only its interleaved
    # trajectory share (1/P of the work), both report the identical
    # cross-host-reduced RMSE, and it matches the single-process run
    assert results[0]["val_rolled"] == [0, 2]
    assert results[1]["val_rolled"] == [1, 3]
    np.testing.assert_allclose(
        results[0]["val_rmse"], results[1]["val_rmse"], rtol=1e-7
    )
    from tests._multihost_common import run_validation

    ref_rmse, ref_rolled = run_validation()
    assert ref_rolled == [0, 1, 2, 3]
    np.testing.assert_allclose(results[0]["val_rmse"], ref_rmse, rtol=2e-5)


def test_multihost_loader_peek_and_resume_single_process():
    """MultihostGraphLoader implements the Trainer's loader contract
    (peek / set_start_batch / set_epoch) — unit-testable single-process,
    where the global batch equals the local one."""
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.parallel import make_mesh
    from graphphysics_tpu.parallel.multihost import MultihostGraphLoader
    from tests.conftest import make_test_graph

    class ListDataset:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    ds = ListDataset([make_test_graph(seed=s) for s in range(32)])
    mesh = make_mesh(8)
    loader = MultihostGraphLoader(ds, per_host_batch=8, mesh=mesh, shuffle=True)

    assert len(loader) == 4
    peeked = loader.peek()
    batches = list(loader)
    assert len(batches) == 4
    np.testing.assert_array_equal(
        np.asarray(peeked.x), np.asarray(batches[0].x)
    )

    # mid-epoch resume: skipping b batches yields the tail of the stream,
    # one-shot (next full iteration starts from 0 again)
    loader.set_start_batch(2)
    resumed = list(loader)
    assert len(resumed) == 2
    np.testing.assert_array_equal(
        np.asarray(resumed[0].x), np.asarray(batches[2].x)
    )
    assert len(list(loader)) == 4

    # different epoch -> different shuffle order
    loader.set_epoch(1)
    ep1 = list(loader)
    assert not np.array_equal(np.asarray(ep1[0].x), np.asarray(batches[0].x))


def test_multihost_loader_bucketed_single_process():
    """Size-bucketed datasets route through the globally-agreed bucket
    schedule: every global batch is bucket-pure (one static shape), all
    full-size batches appear, and peek/resume keep the loader contract.
    Single-process, where the host slice is the whole chunk."""
    import numpy as np

    from graphphysics_tpu.parallel import make_mesh
    from graphphysics_tpu.parallel.multihost import MultihostGraphLoader
    from tests.conftest import make_test_graph

    class BucketedDataset:
        """Two size classes: items 0..15 pad to (64n/192e), 16..27 to
        (32n/96e) — mimics BaseDataset's num_buckets/bucket_of_index API."""

        num_buckets = 2

        def __init__(self):
            small = dict(n=24, e=80, n_pad=32, e_pad=96)
            self.items = [make_test_graph(seed=s) for s in range(16)] + [
                make_test_graph(seed=100 + s, **small) for s in range(20)
            ]

        def __len__(self):
            return len(self.items)

        def bucket_of_index(self, i):
            return 0 if i < 16 else 1

        def __getitem__(self, i):
            return self.items[i]

    ds = BucketedDataset()
    mesh = make_mesh(8)
    loader = MultihostGraphLoader(ds, per_host_batch=8, mesh=mesh, shuffle=True)

    # 16 // 8 + 20 // 8 = 4 full global batches
    assert len(loader) == 4
    batches = list(loader)
    assert len(batches) == 4
    shapes = sorted({b.x.shape for b in batches})
    assert shapes == [(8, 32, 4), (8, 64, 4)]
    assert sum(b.x.shape[1] == 32 for b in batches) == 2
    # every item appears at most once (32 of the 36 fill the full batches)
    seen = np.concatenate([np.asarray(b.x[:, 0, 0]) for b in batches])
    assert len(np.unique(seen)) == len(seen) == 32

    np.testing.assert_array_equal(
        np.asarray(loader.peek().x), np.asarray(batches[0].x)
    )
    loader.set_start_batch(3)
    resumed = list(loader)
    assert len(resumed) == 1
    np.testing.assert_array_equal(
        np.asarray(resumed[0].x), np.asarray(batches[3].x)
    )

    # a bucket smaller than one global batch yields its single partial
    # chunk, padded to the full global batch with fully-masked filler —
    # same contract as GraphLoader (no mesh-size class silently dropped)
    big = MultihostGraphLoader(ds, per_host_batch=32, mesh=mesh,
                               shuffle=False)
    assert len(big) == 2  # one partial chunk per bucket
    big_batches = list(big)
    assert sorted(b.x.shape for b in big_batches) == [(32, 32, 4),
                                                      (32, 64, 4)]
    for b in big_batches:
        valid = np.asarray(b.node_mask).sum(axis=1)
        n_real = int((valid > 0).sum())
        assert n_real in (16, 20)  # every real item of the bucket present
        assert (valid[n_real:] == 0).all()  # filler fully masked
        assert np.asarray(b.edge_mask)[n_real:].sum() == 0
