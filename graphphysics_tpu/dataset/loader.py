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
        num_threads: int = 0,
        collate: str = "concat",
    ):
        """``collate``: "concat" (one flat graph per batch — single-device
        training) or "stack" (leaves ``[B, ...]`` — the data-parallel form
        sharded over the mesh)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
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

    def _batches(self) -> Iterator[Graph]:
        order = self._order()
        n = len(self)
        for b in range(n):
            chunk = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) == 0:
                return
            graphs = [self.dataset[int(i)] for i in chunk]
            if self.collate == "stack":
                yield stack_graphs(graphs)
            else:
                yield concat_graphs(graphs)

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
