"""Batching loader: concat-batches padded Graphs for the device.

The TPU replacement for the reference's PyG ``DataLoader`` (``train.py:133-165``):
items are already static-shape padded Graphs, so batching is a cheap
concatenation with index offsets, and the resulting flat graph shards across
devices at graph granularity.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Iterator, Optional

import numpy as np

from graphphysics_tpu.core.graph import Graph, concat_graphs, stack_graphs


class GraphLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        num_workers: int = 0,
        collate: str = "concat",
    ):
        """``collate``: "concat" (one flat graph per batch — single-device
        training) or "stack" (leaves ``[B, ...]`` — the data-parallel form
        sharded over the mesh). ``num_workers > 0`` builds items in worker
        processes (datasets must be picklable; H5Dataset is)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        if collate not in ("concat", "stack"):
            raise ValueError(f"unknown collate {collate!r}")
        self.collate = collate
        self._epoch = 0
        self._start_batch = 0
        self._bucket_ids_cache: Optional[np.ndarray] = None

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def set_start_batch(self, batch: int) -> None:
        """Skip the first ``batch`` batches of the NEXT iteration only — used
        for exact mid-epoch resume after preemption (items are deterministic
        per (seed, epoch, index), so the stream continues bit-identically)."""
        self._start_batch = int(batch)

    def _bucket_ids(self) -> Optional[np.ndarray]:
        """Per-item bucket ids for size-bucketed datasets, or None. Cached:
        the assignment is immutable once the dataset materializes it."""
        if self._bucket_ids_cache is None:
            self._bucket_ids_cache = dataset_bucket_ids(self.dataset)
        return self._bucket_ids_cache

    def _num_chunks(self, count: int, whole_bucket: bool = False) -> int:
        """Batches for ``count`` items. ``whole_bucket``: a size bucket
        smaller than one batch still yields its partial batch — dropping it
        would silently exclude an entire mesh-size class from every epoch."""
        if self.drop_last:
            n = count // self.batch_size
            if whole_bucket and n == 0 and count > 0:
                return 1
            return n
        return (count + self.batch_size - 1) // self.batch_size

    def __len__(self) -> int:
        ids = self._bucket_ids()
        if ids is None:
            return self._num_chunks(len(self.dataset))
        return sum(
            self._num_chunks(int((ids == b).sum()), whole_bucket=True)
            for b in np.unique(ids)
        )

    def peek(self) -> Graph:
        """Build the first batch synchronously (no prefetch thread) — for
        shape/parameter initialization without leaking a producer thread."""
        chunks = self._batch_chunks()
        idx = chunks[0] if chunks else self._order()[: self.batch_size]
        return self._collate([self.dataset[int(i)] for i in idx])

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])
            )
            rng.shuffle(idx)
        return idx

    def _batch_chunks(self) -> list:
        """Deterministic per-(seed, epoch) list of index chunks, one per
        batch. Size-bucketed datasets group same-bucket items so every batch
        is one static shape (one compiled step per bucket), then shuffle the
        BATCH order; un-bucketed datasets chunk the shuffled order exactly as
        before."""
        return compute_batch_chunks(
            len(self.dataset),
            self.batch_size,
            seed=self.seed,
            epoch=self._epoch,
            shuffle=self.shuffle,
            bucket_ids=self._bucket_ids(),
            chunks_for_count=self._num_chunks,
        )

    def _collate(self, graphs) -> Graph:
        if len(graphs) < self.batch_size:
            # partial batch (a size bucket smaller than one batch, or the
            # last chunk with drop_last=False): pad with fully-MASKED copies
            # of the last graph so every batch keeps the static shape —
            # data-parallel stack sharding needs B divisible by the device
            # count, and concat batches would otherwise recompile. Masked
            # filler contributes zero loss, zero gradients, and zero
            # normalizer statistics (everything is node/edge-mask weighted).
            filler = graphs[-1].replace(
                node_mask=np.zeros_like(graphs[-1].node_mask),
                edge_mask=np.zeros_like(graphs[-1].edge_mask),
            )
            graphs = list(graphs) + [filler] * (self.batch_size - len(graphs))
        if self.collate == "stack":
            return stack_graphs(graphs)
        return concat_graphs(graphs)

    def _batches(self, pool=None, chunks=None) -> Iterator[Graph]:
        if chunks is None:
            chunks = self._batch_chunks()
        start, self._start_batch = self._start_batch, 0  # one-shot
        if self.num_workers > 0:
            yield from self._batches_multiprocess(chunks, pool, start)
            return
        for b in range(start, len(chunks)):
            graphs = [self.dataset[int(i)] for i in chunks[b]]
            yield self._collate(graphs)

    def _materialize_static_shapes(self, order) -> None:
        """Workers must inherit CONCRETE static-shape state (budgets, ELL
        degree) or each would derive its own and pad to different shapes."""
        ds = self.dataset
        layout = getattr(ds, "edge_layout", "coo")
        lazy = getattr(ds, "node_budget", 1) is None or (
            # edge_budget stays None on the ELL path (ell_degree is its
            # static-shape state) — only COO/CSR layouts pad by edge budget
            layout in ("coo", "csr") and getattr(ds, "edge_budget", 1) is None
        ) or (layout == "ell" and getattr(ds, "ell_degree", 1) is None) or (
            layout == "csr" and getattr(ds, "csr_max_chunks", 1) is None
        )
        if lazy:
            ds[int(order[0])]

    def _make_pool(self, order):
        import concurrent.futures as cf
        import multiprocessing as mp

        self._materialize_static_shapes(order)
        # fork explicitly: initargs (the dataset, incl. its preprocessing
        # pipeline) stay inherited rather than pickled, and behavior doesn't
        # change when the platform default flips to forkserver/spawn. The
        # pool is created from the MAIN thread (before the prefetch thread
        # exists) to avoid fork-with-threads hazards.
        ctx = mp.get_context("fork") if hasattr(os, "fork") else None
        return cf.ProcessPoolExecutor(
            max_workers=self.num_workers,
            mp_context=ctx,
            initializer=_init_worker,
            initargs=(self.dataset,),
        )

    def _batches_multiprocess(self, chunks, pool, start=0) -> Iterator[Graph]:
        """Worker PROCESSES build items in parallel (the role of the
        reference's DataLoader workers, train.py:133-161 — including for h5,
        which the reference forces to 0 workers; our H5Dataset reopens its
        file handle per process). Items are prefetched ``prefetch`` batches
        ahead and yielded in order."""
        window = max(self.prefetch, 1) + 1
        n = len(chunks)
        with pool:
            pending = {}

            def submit(b):
                pending[b] = [
                    pool.submit(_worker_get, int(i)) for i in chunks[b]
                ]

            for b in range(start, min(start + window, n)):
                submit(b)
            for b in range(start, n):
                graphs = [f.result() for f in pending.pop(b)]
                if b + window < n:
                    submit(b + window)
                yield self._collate(graphs)

    def __iter__(self) -> Iterator[Graph]:
        chunks = self._batch_chunks()  # computed once per epoch
        # worker pool (if any) is created in the MAIN thread, pre-fork-safe
        pool = None
        if self.num_workers > 0:
            first = chunks[0] if chunks else self._order()[:1]
            pool = self._make_pool(first)
        if self.prefetch <= 0:
            yield from self._batches(pool, chunks)
            return
        # background-thread prefetch: overlaps host-side graph building /
        # padding with device compute (the role DataLoader workers play in
        # the reference, train.py:133-161)
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def producer():
            try:
                for item in self._batches(pool, chunks):
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue_mod.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False, cancel_futures=True)
                # deliver the sentinel even when the queue is full (dropping
                # it would leave the consumer blocked on q.get after draining)
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.5)
                        break
                    except queue_mod.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # consumer abandoned mid-epoch (exception / break): unblock and
            # stop the producer so the worker pool is released
            stop.set()


def compute_batch_chunks(
    total: int,
    batch_size: int,
    *,
    seed: int,
    epoch: int,
    shuffle: bool,
    bucket_ids: Optional[np.ndarray],
    chunks_for_count,
) -> list:
    """The deterministic per-(seed, epoch) batching schedule shared by
    GraphLoader and MultihostGraphLoader — ONE implementation so hosts that
    derive it independently stay provably aligned.

    Items are shuffled with SeedSequence([seed, epoch]); with ``bucket_ids``
    they are grouped bucket-pure (every chunk one static shape) and the
    CHUNK order is shuffled with SeedSequence([seed, epoch, 1]).
    ``chunks_for_count(count, whole_bucket=False)`` decides how many batches
    a bucket of ``count`` items yields (partial-batch policy)."""
    order = np.arange(total)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(order)
    bs = batch_size
    if bucket_ids is None:
        n = chunks_for_count(total)
        return [order[b * bs : (b + 1) * bs] for b in range(n)]
    oid = bucket_ids[order]
    chunks = []
    for b in np.unique(oid):
        sel = order[oid == b]
        chunks += [
            sel[j * bs : (j + 1) * bs]
            for j in range(chunks_for_count(len(sel), whole_bucket=True))
        ]
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, 1]))
        chunks = [chunks[int(p)] for p in rng.permutation(len(chunks))]
    return chunks


def dataset_bucket_ids(ds) -> Optional[np.ndarray]:
    """Per-item bucket ids for a size-bucketed dataset, or None when the
    dataset is un-bucketed (or its buckets collapse to one). Shared by
    GraphLoader and MultihostGraphLoader so both group batches identically."""
    if getattr(ds, "num_buckets", 1) <= 1 or not hasattr(ds, "bucket_of_index"):
        return None
    if len(ds):
        ds.bucket_of_index(0)  # materialize (may collapse num_buckets)
    if getattr(ds, "num_buckets", 1) <= 1:
        return None
    traj_bucket = getattr(ds, "_traj_bucket", None)
    per = getattr(ds, "frames_per_trajectory", None)
    if traj_bucket is not None and per:
        ids = np.repeat(np.asarray(traj_bucket), per)[: len(ds)]
    else:
        ids = np.array([ds.bucket_of_index(i) for i in range(len(ds))])
    return ids


# -- worker-process globals: the dataset is pickled once per worker via the
#    pool initializer instead of per task
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    # Under fork the parent's open state is INHERITED (initargs are not
    # pickled, so __getstate__-based reopen never runs): drop any open h5
    # handle — sharing one OS file description across forked processes
    # corrupts HDF5 reads — and per-process caches.
    reset = getattr(dataset, "reset_process_state", None)
    if reset is not None:
        reset()


def _worker_get(index: int):
    return _WORKER_DATASET[index]
