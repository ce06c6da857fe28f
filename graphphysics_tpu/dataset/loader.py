"""Batching loader: concat-batches padded Graphs for the device.

The TPU replacement for the reference's PyG ``DataLoader`` (``train.py:133-165``):
items are already static-shape padded Graphs, so batching is a cheap
concatenation with index offsets, and the resulting flat graph shards across
devices at graph granularity.
"""

from __future__ import annotations

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

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def peek(self) -> Graph:
        """Build the first batch synchronously (no prefetch thread) — for
        shape/parameter initialization without leaking a producer thread."""
        idx = self._order()[: self.batch_size]
        graphs = [self.dataset[int(i)] for i in idx]
        if self.collate == "stack":
            return stack_graphs(graphs)
        return concat_graphs(graphs)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])
            )
            rng.shuffle(idx)
        return idx

    def _collate(self, graphs) -> Graph:
        if self.collate == "stack":
            return stack_graphs(graphs)
        return concat_graphs(graphs)

    def _batches(self) -> Iterator[Graph]:
        order = self._order()
        n = len(self)
        if self.num_workers > 0:
            yield from self._batches_multiprocess(order, n)
            return
        for b in range(n):
            chunk = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) == 0:
                return
            graphs = [self.dataset[int(i)] for i in chunk]
            yield self._collate(graphs)

    def _batches_multiprocess(self, order, n) -> Iterator[Graph]:
        """Worker PROCESSES build items in parallel (the role of the
        reference's DataLoader workers, train.py:133-161 — including for h5,
        which the reference forces to 0 workers; our H5Dataset reopens its
        file handle per process). Items are prefetched ``prefetch`` batches
        ahead and yielded in order."""
        import concurrent.futures as cf

        if getattr(self.dataset, "node_budget", 1) is None:
            # each worker would derive budgets from ITS first item and pad to
            # different static shapes; materialize one item first
            self.dataset[int(order[0])]
        window = max(self.prefetch, 1) + 1
        with cf.ProcessPoolExecutor(
            max_workers=self.num_workers,
            initializer=_init_worker,
            initargs=(self.dataset,),
        ) as pool:
            pending = {}

            def submit(b):
                chunk = order[b * self.batch_size : (b + 1) * self.batch_size]
                pending[b] = [
                    pool.submit(_worker_get, int(i)) for i in chunk
                ]

            for b in range(min(window, n)):
                submit(b)
            for b in range(n):
                graphs = [f.result() for f in pending.pop(b)]
                if b + window < n:
                    submit(b + window)
                yield self._collate(graphs)

    def __iter__(self) -> Iterator[Graph]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        # background-thread prefetch: overlaps host-side graph building /
        # padding with device compute (the role DataLoader workers play in
        # the reference, train.py:133-161)
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []

        def producer():
            try:
                for item in self._batches():
                    q.put(item)
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


# -- worker-process globals: the dataset is pickled once per worker via the
#    pool initializer instead of per task
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(index: int):
    return _WORKER_DATASET[index]
