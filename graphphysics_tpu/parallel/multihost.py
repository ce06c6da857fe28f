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
    the global batch.

    Size-bucketed datasets (``num_buckets > 1``) are supported by switching
    to a GLOBALLY-agreed schedule: every host derives the same deterministic
    bucket-grouped chunk list from (seed, epoch) — exactly GraphLoader's
    grouping at global-batch granularity — and slices its own
    ``per_host_batch`` rows out of each chunk, so every global stacked batch
    stays one static shape (one compiled step per bucket)."""

    def __init__(self, dataset, per_host_batch: int, mesh, shuffle=True,
                 seed=0, num_workers: int = 0):
        """``num_workers > 0`` builds this host's items in spawn worker
        processes (the persistent pool of ``dataset.loader``), parallelizing
        WITHIN each per-host batch — useful when items are expensive (k-hop,
        world-edge kd-trees) and every host must keep its chips fed."""
        self.dataset = dataset
        self.per_host_batch = per_host_batch
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self._epoch = 0
        self._start_batch = 0
        self._bucket_ids_cache = None
        self._pool = None
        self._pool_finalizer = None

    def _bucket_ids(self):
        from graphphysics_tpu.dataset.loader import dataset_bucket_ids

        if self._bucket_ids_cache is None:
            self._bucket_ids_cache = dataset_bucket_ids(self.dataset)
        return self._bucket_ids_cache

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
        ids = self._bucket_ids()
        if ids is not None:
            return len(self._global_chunks())
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

    def _global_chunks(self):
        """Bucketed schedule: deterministic per-(seed, epoch) list of GLOBAL
        index chunks (one per global batch, bucket-pure) — GraphLoader's own
        schedule (``compute_batch_chunks``) at global-batch granularity, so
        it is identical on every host and hosts stay shape-aligned without
        any communication. Host p takes rows [p*B : (p+1)*B] of each chunk.
        A bucket smaller than one global batch still yields its single
        partial chunk (every host pads its short slice with masked filler —
        dropping it would silently exclude an entire mesh-size class)."""
        from graphphysics_tpu.dataset.loader import compute_batch_chunks

        gb = self.per_host_batch * jax.process_count()

        def chunks_for_count(count, whole_bucket=False):
            n = count // gb
            if whole_bucket and n == 0 and count > 0:
                return 1
            return n

        return compute_batch_chunks(
            len(self.dataset),
            gb,
            seed=self.seed,
            epoch=self._epoch,
            shuffle=self.shuffle,
            bucket_ids=self._bucket_ids(),
            chunks_for_count=chunks_for_count,
        )

    def _build_items(self, rows):
        """Items for this host's slice — via the worker pool when enabled."""
        if self.num_workers <= 0:
            return [self.dataset[int(i)] for i in rows]
        from graphphysics_tpu.dataset.loader import attach_worker_pool

        # materialize from the CANONICAL index even when this host's slice
        # is empty (a partial chunk): the pool must pickle a dataset whose
        # static budgets are concrete, or every worker re-derives them
        pool = attach_worker_pool(
            self, self.dataset, self.num_workers,
            rows if len(rows) else np.array([0]),
        )
        gen = pool.begin_epoch()
        tasks = [pool.submit(int(i), self._epoch, gen) for i in rows]
        try:
            return [t.result() for t in tasks]
        except BaseException:
            # a failed item must not leave the slice's remaining tasks
            # polluting pool state for the next batch
            pool.cancel_pending(gen)
            raise

    def close(self) -> None:
        """Shut down the worker pool (idempotent; also runs at GC)."""
        from graphphysics_tpu.dataset.loader import close_worker_pool

        close_worker_pool(self)

    def _local_from_chunk(self, chunk: np.ndarray):
        from graphphysics_tpu.core.graph import stack_graphs

        p = jax.process_index()
        rows = chunk[p * self.per_host_batch : (p + 1) * self.per_host_batch]
        graphs = self._build_items(rows)
        if len(graphs) < self.per_host_batch:
            # partial global chunk: every host must still ship an equal
            # static slice, so the shortfall pads with fully-MASKED copies
            # of a chunk graph (zero loss/grad/normalizer contribution —
            # same contract as GraphLoader._collate). Hosts whose slice is
            # empty build the chunk's first item as the shape template;
            # the chunk is bucket-pure so every host's shapes agree.
            template = graphs[-1] if graphs else self.dataset[int(chunk[0])]
            filler = template.replace(
                node_mask=np.zeros_like(template.node_mask),
                edge_mask=np.zeros_like(template.edge_mask),
            )
            graphs += [filler] * (self.per_host_batch - len(graphs))
        return stack_graphs(graphs)

    def _local_batch(self, idx: np.ndarray, b: int):
        from graphphysics_tpu.core.graph import stack_graphs

        chunk = idx[b * self.per_host_batch : (b + 1) * self.per_host_batch]
        return stack_graphs(self._build_items(chunk))

    def peek(self):
        """First global batch, built synchronously — for shape/parameter
        initialization (same contract as ``dataset.GraphLoader.peek``)."""
        if self._bucket_ids() is not None:
            chunks = self._global_chunks()
            return global_batch_from_local(
                self._local_from_chunk(chunks[0]), self.mesh
            )
        return global_batch_from_local(
            self._local_batch(self._order(), 0), self.mesh
        )

    def __iter__(self):
        start, self._start_batch = self._start_batch, 0
        if self._bucket_ids() is not None:
            for chunk in self._global_chunks()[start:]:
                yield global_batch_from_local(
                    self._local_from_chunk(chunk), self.mesh
                )
            return
        idx = self._order()
        for b in range(start, len(self)):
            yield global_batch_from_local(self._local_batch(idx, b), self.mesh)
