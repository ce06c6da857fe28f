"""Multi-host (multi-slice / DCN) utilities.

The reference has no distributed runtime at all (SURVEY.md §2.4). On TPU the
pattern is: ``jax.distributed.initialize`` per host, a global mesh spanning
all hosts, per-host input sharding, and ``jax.make_array_from_process_local_data``
to assemble global sharded batches; all collectives stay XLA (ICI intra-slice,
DCN across slices) — no NCCL/MPI analog needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op on a single process). On
    cloud TPU pods the arguments auto-detect from the environment."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def process_local_indices(total: int) -> np.ndarray:
    """The shard of dataset indices this host is responsible for — the
    multi-host analog of DataLoader sharding."""
    p, n = jax.process_index(), jax.process_count()
    return np.arange(total)[p::n]


def global_batch_from_local(batch, mesh, axis_name: str = "data"):
    """Assemble a globally-sharded batch from this host's local stacked batch
    (leaves ``[B_local, ...]``); the global batch axis spans all hosts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        batch,
    )


class MultihostGraphLoader:
    """Wraps a dataset for multi-host training: each host loads its own
    interleaved subset of items and contributes ``per_host_batch`` graphs to
    the global batch."""

    def __init__(self, dataset, per_host_batch: int, mesh, shuffle=True, seed=0):
        if getattr(dataset, "num_buckets", 1) > 1:
            # materialize first: uniform-size / unscannable datasets collapse
            # to a single bucket and are fine
            if hasattr(dataset, "bucket_of_index") and len(dataset):
                dataset.bucket_of_index(0)
        if getattr(dataset, "num_buckets", 1) > 1:
            # hosts assemble ONE global stacked batch per step — mixed-shape
            # buckets can't stack across hosts; pad to the global budget
            raise ValueError(
                "MultihostGraphLoader does not support size-bucketed "
                "datasets (num_buckets > 1): the global batch must be one "
                "static shape across hosts — use num_buckets=1"
            )
        self.dataset = dataset
        self.per_host_batch = per_host_batch
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self._start_batch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def set_start_batch(self, batch: int) -> None:
        """Skip the first ``batch`` batches of the NEXT iteration only —
        exact mid-epoch resume (same contract as ``dataset.GraphLoader``;
        every host skips the same count, so the global stream stays
        aligned)."""
        self._start_batch = int(batch)

    def __len__(self) -> int:
        per_host = len(self.dataset) // jax.process_count()
        return per_host // self.per_host_batch

    def _order(self) -> np.ndarray:
        idx = process_local_indices(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])
            )
            rng.shuffle(idx)
        return idx

    def _local_batch(self, idx: np.ndarray, b: int):
        from graphphysics_tpu.core.graph import stack_graphs

        chunk = idx[b * self.per_host_batch : (b + 1) * self.per_host_batch]
        return stack_graphs([self.dataset[int(i)] for i in chunk])

    def peek(self):
        """First global batch, built synchronously — for shape/parameter
        initialization (same contract as ``dataset.GraphLoader.peek``)."""
        return global_batch_from_local(
            self._local_batch(self._order(), 0), self.mesh
        )

    def __iter__(self):
        idx = self._order()
        start, self._start_batch = self._start_batch, 0
        for b in range(start, len(self)):
            yield global_batch_from_local(self._local_batch(idx, b), self.mesh)
