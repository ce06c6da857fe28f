"""Shared fixtures for the multi-host test: deterministic synthetic graphs
and the DP training setup, used identically by the 2-process workers and the
single-process reference run so their results are directly comparable."""

import numpy as np


def make_graphs(count, n=256, e=1024):
    from graphphysics_tpu.core.graph import pad_graph_np

    out = []
    for seed in range(count):
        r = np.random.default_rng(seed)
        x = r.normal(size=(n, 4)).astype(np.float32)
        x[:, 2] = r.integers(0, 7, size=n)
        pos = r.normal(size=(n, 2)).astype(np.float32)
        s = r.integers(0, n, size=e).astype(np.int32)
        t = r.integers(0, n, size=e).astype(np.int32)
        ea = r.normal(size=(e, 3)).astype(np.float32)
        y = r.normal(size=(n, 2)).astype(np.float32)
        out.append(
            pad_graph_np(x, pos, s, t, n_pad=n, e_pad=e, edge_attr=ea, y=y,
                         node_type_index=2)
        )
    return out


def make_partitioned(num_parts):
    """One deterministic mesh-like graph, halo-partitioned ``num_parts``
    ways (same inputs on every process)."""
    import jax.numpy as jnp
    import jax

    from graphphysics_tpu.core.graph import pad_graph_np
    from graphphysics_tpu.parallel import partition_graph_halo_np
    from graphphysics_tpu.topology.build import to_undirected

    n = 128 * num_parts
    rng = np.random.default_rng(0)
    s = rng.integers(0, n, 3 * n).astype(np.int32)
    t = (s + rng.integers(1, 9, 3 * n)).astype(np.int32) % n
    S, R = to_undirected(s, t)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = rng.integers(0, 7, n)
    g = pad_graph_np(
        x, rng.normal(size=(n, 2)).astype(np.float32), S, R,
        n_pad=n, e_pad=len(S) + 64,
        edge_attr=rng.normal(size=(len(S), 3)).astype(np.float32),
        y=rng.normal(size=(n, 2)).astype(np.float32), node_type_index=2,
    )
    return partition_graph_halo_np(g, num_parts)


def make_bucketed_dataset():
    """16 deterministic graphs in two size classes (8x 256n/1024e,
    8x 128n/512e) behind BaseDataset's num_buckets/bucket_of_index API —
    for the bucketed MultihostGraphLoader legs."""
    items = make_graphs(8) + make_graphs(8, n=128, e=512)

    class BucketedDataset:
        num_buckets = 2

        def __len__(self):
            return len(items)

        def bucket_of_index(self, i):
            return 0 if i < 8 else 1

        def __getitem__(self, i):
            return items[i]

    return BucketedDataset()


def make_state():
    """(sim, tx, fresh state) — deterministic across processes."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphphysics_tpu.core.graph import flatten_batched_graph, stack_graphs
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.models.processors import EncodeProcessDecode
    from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
    from graphphysics_tpu.parallel import make_dp_train_step

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=16,
    )
    sim = Simulator(config=cfg, model=model)
    example = jax.tree_util.tree_map(
        jnp.asarray, flatten_batched_graph(stack_graphs(make_graphs(1)))
    )
    variables = sim.init({"params": jax.random.key(0)}, example)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    return sim, tx, state


def make_setup(mesh):
    """(sim, tx, fresh state, jitted DP train step) on the given mesh."""
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.parallel import make_dp_train_step

    sim, tx, state = make_state()
    step = make_dp_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    return sim, tx, state, step


def make_gp_setup(mesh, graph_axis="graph"):
    """(fresh state, jitted edge-partitioned train step) on the given mesh
    — same model/optimizer as ``make_setup``."""
    from graphphysics_tpu.core.nodetype import NodeType
    from graphphysics_tpu.parallel import make_graph_parallel_train_step

    sim, tx, state = make_state()
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh,
        graph_axis=graph_axis,
    )
    return state, step


VAL_PARAM = {
    "model": {"type": "epd", "message_passing_num": 1, "hidden_size": 8,
              "node_input_size": 2, "edge_input_size": 3, "output_size": 2},
    "index": {"feature_index_start": 0, "feature_index_end": 2,
              "output_index_start": 0, "output_index_end": 2,
              "node_type_index": 2},
}


class TrajectoryDataset:
    """4 deterministic trajectories x 3 frames — the minimal surface
    Trainer.validate needs (size_dataset / trajectory_indices / __getitem__)."""

    size_dataset = 4
    frames_per_traj = 3

    def __init__(self):
        self._items = make_graphs(self.size_dataset * self.frames_per_traj,
                                  n=128, e=512)

    def __len__(self):
        return len(self._items)

    def trajectory_indices(self, t):
        f = self.frames_per_traj
        return list(range(t * f, (t + 1) * f))

    def __getitem__(self, i):
        return self._items[i]


def run_validation(seed=0):
    """Build a Trainer with deterministic weights and validate the
    TrajectoryDataset; returns (rmse, trajectories_this_process_rolled)."""
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.training.trainer import Trainer

    ds = TrajectoryDataset()
    trainer = Trainer(VAL_PARAM, metrics_path=None, rollout_dir=None)
    gj = jax.tree_util.tree_map(jnp.asarray, ds[0])
    variables = trainer.sim.init({"params": jax.random.key(seed)}, gj)
    trainer.state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": None,
        "step": jnp.zeros((), jnp.int32),
    }
    rolled = []
    orig = trainer._traj_chunks

    def spy(dataset, traj_ids, group):
        chunks = orig(dataset, traj_ids, group)
        rolled.extend(t for c in chunks for t in c)
        return chunks

    trainer._traj_chunks = spy
    rmse = trainer.validate(ds, epoch=0, save_rollout=False)
    return rmse, sorted(rolled)
