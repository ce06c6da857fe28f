"""Batching loader: concat-batches padded Graphs for the device.

The TPU replacement for the reference's PyG ``DataLoader`` (``train.py:133-165``):
items are already static-shape padded Graphs, so batching is a cheap
concatenation with index offsets, and the resulting flat graph shards across
devices at graph granularity.
"""

from __future__ import annotations

import contextlib
import os
import threading
import queue as queue_mod
import weakref
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
        self._pool: Optional["_SpawnWorkerPool"] = None
        self._pool_finalizer = None

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
        materialize_static_shapes(self.dataset, order)

    def _ensure_pool(self, order):
        """The worker pool PERSISTS across epochs: spawn startup costs
        ~1-2 s per worker (fresh interpreter + imports), which a per-epoch
        pool would pay every epoch. Workers receive the current epoch with
        every task (the one piece of parent-side dataset state that mutates
        between epochs), so their pickled dataset copies stay in sync."""
        return attach_worker_pool(self, self.dataset, self.num_workers, order)

    def close(self) -> None:
        """Shut down the persistent worker pool (idempotent). Also runs at
        loader garbage collection; daemon workers die with the parent
        regardless."""
        close_worker_pool(self)

    def _batches_multiprocess(self, chunks, pool, start=0) -> Iterator[Graph]:
        """Worker PROCESSES build items in parallel (the role of the
        reference's DataLoader workers, train.py:133-161 — including for h5,
        which the reference forces to 0 workers; our H5Dataset reopens its
        file handle per process). Items are prefetched ``prefetch`` batches
        ahead and yielded in order."""
        window = max(self.prefetch, 1) + 1
        n = len(chunks)
        epoch = self._epoch
        gen = pool.begin_epoch()
        pending = {}
        try:

            def submit(b):
                pending[b] = [
                    pool.submit(int(i), epoch, gen) for i in chunks[b]
                ]

            for b in range(start, min(start + window, n)):
                submit(b)
            for b in range(start, n):
                graphs = [f.result() for f in pending.pop(b)]
                if b + window < n:
                    submit(b + window)
                yield self._collate(graphs)
        finally:
            # abandoned mid-epoch: drop THIS generation's queued/in-flight
            # work but KEEP the workers alive for the next epoch (the gen
            # token keeps a straggling teardown from touching newer epochs)
            pool.cancel_pending(gen)

    def __iter__(self) -> Iterator[Graph]:
        chunks = self._batch_chunks()  # computed once per epoch
        # the persistent worker pool (if any) is created in the MAIN thread
        # (not the prefetch thread) on first use
        pool = None
        if self.num_workers > 0:
            first = chunks[0] if chunks else self._order()[:1]
            pool = self._ensure_pool(first)
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
            # stop the producer, and JOIN it — its epoch-teardown
            # cancel_pending() must not race a subsequent iteration's
            # submissions on the persistent pool (it would cancel them)
            stop.set()
            t.join(timeout=60.0)


def attach_worker_pool(owner, dataset, num_workers: int, order):
    """Create (once) and attach the persistent spawn pool + GC finalizer to
    ``owner`` (expects ``owner._pool`` / ``owner._pool_finalizer`` slots) —
    the one pool-lifecycle implementation shared by GraphLoader and
    MultihostGraphLoader.

    spawn, never fork: the parent is a multithreaded JAX process, and
    fork() under live threads is a documented deadlock (the reference sets
    the spawn start method for the same reason, train.py:266). Workers are
    started EAGERLY so every child inherits the sanitized environment
    (_worker_env) — Python 3.12's ProcessPoolExecutor spawns lazily per
    submit, which would let workers inherit whatever the env looks like
    mid-epoch."""
    if owner._pool is None:
        materialize_static_shapes(dataset, order)
        owner._pool = _SpawnWorkerPool(dataset, num_workers)
        owner._pool_finalizer = weakref.finalize(
            owner, _shutdown_pool, owner._pool
        )
    return owner._pool


def close_worker_pool(owner) -> None:
    """Shut down ``owner``'s pool and detach its GC finalizer (idempotent)."""
    if owner._pool is not None:
        owner._pool.shutdown(wait=True, cancel_futures=True)
        owner._pool = None
    if getattr(owner, "_pool_finalizer", None) is not None:
        owner._pool_finalizer.detach()
        owner._pool_finalizer = None


def materialize_static_shapes(ds, order) -> None:
    """Build one item if any lazy static budget is unset: workers must
    inherit CONCRETE static-shape state (budgets, ELL degree) through the
    pickle or each would derive its own and pad to different shapes."""
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


# -- spawn worker pool ------------------------------------------------------
#
# PYTHONPATH entries dropped from worker processes: site dirs whose
# sitecustomize initializes an accelerator backend at interpreter startup
# (the TPU tunnel plugin does). Loader workers do host-side numpy work only;
# letting each one grab the device is slow and hang-prone.
_WORKER_PYTHONPATH_EXCLUDE = (".axon_site",)


@contextlib.contextmanager
def _worker_env():
    """Environment for spawned loader workers: CPU-only JAX, accelerator
    site dirs stripped. Applied around Process.start() — spawn children
    snapshot os.environ at start time."""
    saved = {k: os.environ.get(k) for k in ("PYTHONPATH", "JAX_PLATFORMS")}
    parts = [
        p
        for p in (saved["PYTHONPATH"] or "").split(os.pathsep)
        if p and not any(m in p for m in _WORKER_PYTHONPATH_EXCLUDE)
    ]
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _worker_main(dataset, tasks, results):
    # Spawn pickled the dataset (h5 handles/caches dropped by __getstate__);
    # reset_process_state is still called for datasets that keep per-process
    # state outside __getstate__.
    reset = getattr(dataset, "reset_process_state", None)
    if reset is not None:
        reset()
    last_epoch = None
    while True:
        task = tasks.get()
        if task is None:
            return
        tid, index, epoch = task
        if epoch != last_epoch:
            # the pool persists across epochs; the parent's set_epoch never
            # reaches the pickled copy, so each task carries the epoch
            set_epoch = getattr(dataset, "set_epoch", None)
            if set_epoch is not None:
                set_epoch(epoch)
            last_epoch = epoch
        try:
            results.put((tid, True, dataset[index]))
        except BaseException as e:  # noqa: BLE001 — relayed to the parent
            import pickle
            import traceback

            # mp.Queue serializes in its FEEDER thread, so put() itself
            # never raises on an unpicklable payload — it would be dropped
            # later and the parent would wait forever. Pre-check the
            # exception and fall back to a traceback-string error.
            try:
                pickle.dumps(e)
                results.put((tid, False, e))
            except Exception:
                results.put(
                    (tid, False, RuntimeError(traceback.format_exc()))
                )


def _shutdown_pool(pool):
    """weakref.finalize target: must be a module-level function (bound
    methods keep the loader alive)."""
    try:
        pool.shutdown(wait=False, cancel_futures=True)
    except Exception:
        pass


class _PoolTask:
    """Minimal future: results are drained by the single consuming thread."""

    __slots__ = ("_pool", "_tid")

    def __init__(self, pool, tid):
        self._pool = pool
        self._tid = tid

    def result(self):
        return self._pool._result_for(self._tid)


class _SpawnWorkerPool:
    """Item-building worker processes (the role of the reference DataLoader's
    workers, ``train.py:133-161``), started eagerly via the spawn context.

    spawn (not fork) because the parent is multithreaded under JAX; each
    child pays a fresh-interpreter + jax-on-CPU import at startup (~1-2 s,
    overlapped across workers and amortized over the epoch). User __main__
    scripts must be guarded with ``if __name__ == "__main__":`` as with any
    spawn-based multiprocessing.

    Concurrent iterators over one loader share this pool: submissions are
    tagged with a per-epoch generation so one iterator's teardown only
    cancels its own work, and result draining is safe under the GIL (each
    waiter re-checks ``_done`` after any thread stores into it). Items must
    pickle (numpy-array Graphs do); a worker whose ITEM payload fails to
    pickle is dropped by the mp.Queue feeder — keep custom per-item payloads
    picklable.
    """

    def __init__(self, dataset, num_workers: int):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self._tasks = ctx.Queue()
        self._results = ctx.Queue()
        self._done: dict = {}
        self._next_tid = 0
        self._pending: set = set()
        self._cancelled: set = set()
        self._tid_gen: dict = {}
        self._gen = 0
        self._shutdown = False
        # guards the bookkeeping above: concurrent iterators run two
        # producer threads against one pool (never held across queue waits)
        self._lock = threading.Lock()
        with _worker_env():
            self._procs = [
                ctx.Process(
                    target=_worker_main,
                    args=(dataset, self._tasks, self._results),
                    daemon=True,
                )
                for _ in range(num_workers)
            ]
            for p in self._procs:
                p.start()

    def begin_epoch(self) -> int:
        """Start a submission generation; pass the token to cancel_pending
        so a straggling teardown can only cancel ITS OWN epoch's work."""
        with self._lock:
            self._gen += 1
            return self._gen

    def submit(self, index: int, epoch: int = 0,
               gen: Optional[int] = None) -> _PoolTask:
        with self._lock:
            tid = self._next_tid
            self._next_tid += 1
            self._pending.add(tid)
            # tag with the SUBMITTER's generation: a straggling old producer
            # must not label its tasks with a newer iterator's gen
            self._tid_gen[tid] = self._gen if gen is None else gen
        self._tasks.put((tid, int(index), int(epoch)))
        return _PoolTask(self, tid)

    def _result_for(self, tid: int):
        while True:
            with self._lock:
                if tid in self._done:
                    ok, payload = self._done.pop(tid)
                    self._tid_gen.pop(tid, None)
                    break
            if self._shutdown:
                raise RuntimeError(
                    "worker pool was shut down with results pending"
                )
            try:
                rtid, ok, payload = self._results.get(timeout=1.0)
            except queue_mod.Empty:
                # torch-DataLoader semantics: a worker NEVER exits on its
                # own mid-epoch (only shutdown sends sentinels), so any
                # dead process means its in-flight task would hang this
                # wait forever — fail fast with the exit code.
                dead = [
                    p for p in self._procs if not p.is_alive()
                ] if not self._shutdown else []
                if dead:
                    codes = [p.exitcode for p in dead]
                    raise RuntimeError(
                        f"{len(dead)} loader worker(s) died unexpectedly "
                        f"(exit codes {codes}) with results pending — "
                        f"commonly an OOM kill; lower num_workers or the "
                        f"dataset's per-item memory"
                    ) from None
                continue
            with self._lock:
                if rtid in self._cancelled:  # stale: abandoned epoch
                    self._cancelled.discard(rtid)
                    self._tid_gen.pop(rtid, None)
                    continue
                self._pending.discard(rtid)
                self._done[rtid] = (ok, payload)
        if not ok:
            raise payload
        return payload

    def cancel_pending(self, gen: Optional[int] = None) -> None:
        """Drop queued tasks and forget in-flight ones WITHOUT stopping the
        workers — the abandoned-epoch path of a persistent pool. In-flight
        results that later arrive are discarded by _result_for.

        ``gen`` (from ``begin_epoch``) restricts the cancellation to that
        submission generation: a teardown firing LATE (its producer thread
        outlived the 60 s abandon join on a slow item) must not cancel a
        newer epoch's submissions. ``None`` cancels everything (shutdown).
        """

        def mine(tid):
            return gen is None or self._tid_gen.get(tid) == gen

        requeue = []
        while True:
            try:
                task = self._tasks.get_nowait()
            except queue_mod.Empty:
                break
            if task is None:
                continue
            with self._lock:
                if mine(task[0]):
                    self._pending.discard(task[0])
                    self._tid_gen.pop(task[0], None)
                else:
                    requeue.append(task)
        for task in requeue:  # another generation's queued work survives
            self._tasks.put(task)
        with self._lock:
            in_flight = {t for t in self._pending if mine(t)}
            self._cancelled.update(in_flight)
            self._pending.difference_update(in_flight)
            for t in list(self._done):
                if mine(t):
                    del self._done[t]
                    self._tid_gen.pop(t, None)

    def shutdown(self, wait: bool = True, cancel_futures: bool = False):
        if self._shutdown:
            return
        self._shutdown = True
        if cancel_futures:
            while True:
                try:
                    self._tasks.get_nowait()
                except queue_mod.Empty:
                    break
        for _ in self._procs:
            self._tasks.put(None)
        if wait:
            for p in self._procs:
                p.join(timeout=10)
        for p in self._procs:
            if not p.is_alive():
                continue
            if wait:
                p.terminate()
        self._tasks.close()
        self._results.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown(wait=True)
        return False
