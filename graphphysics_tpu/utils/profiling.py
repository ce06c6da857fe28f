"""Profiling / throughput instrumentation.

The reference has no profiler integration (SURVEY.md §5); this provides the
TPU equivalents: a ``jax.profiler`` trace context, a throughput meter
(edges/sec/chip — the framework's primary performance metric, BASELINE.md),
and an honest step timer.

NOTE on methodology (measured on the tunnel device): per-op times inside a
``jax.profiler`` trace carry ~0.7 ms/op tracing overhead, so per-op numbers
are only useful relatively. Wall-clock over a chain of *dependent* steps
(each step consuming the previous state) is the trustworthy absolute number.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    with jax.profiler.trace(log_dir):
        yield


class ThroughputMeter:
    """Edges/sec (and steps/sec) over a sliding window of train steps."""

    def __init__(self, edges_per_step: int, window: int = 50):
        self.edges_per_step = edges_per_step
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)

    @property
    def edges_per_sec(self) -> float:
        return self.steps_per_sec * self.edges_per_step


def fetch_sync(*objs) -> None:
    """Force completion of everything the given pytrees depend on by
    FETCHING one element of each first leaf to the host.

    ``block_until_ready`` has been OBSERVED TO RETURN EARLY through
    remote-tunnel backends (a 16k^3 matmul "completing" in 0.05 ms; a train
    step reported 1.96 ms whose fetch-synced time was 826 ms) — a host read
    of result data cannot lie."""
    import numpy as np

    for o in objs:
        for leaf in jax.tree_util.tree_leaves(o):
            if getattr(leaf, "size", 0) == 0:
                continue  # zero-size leaves carry no fetchable data
            np.asarray(jax.numpy.ravel(leaf)[0])
            break


def time_chained_steps(
    step_fn: Callable,
    state,
    batch,
    iters: int = 30,
    warmup: int = 3,
):
    """Honest per-step wall time: run ``iters`` dependent steps (state flows
    through) and synchronize only at the end — by fetching host scalars from
    both the final loss and the final state (NOT ``block_until_ready``; see
    ``fetch_sync``). Returns (seconds_per_step, state)."""
    loss = None
    for _ in range(warmup):
        state, loss = step_fn(state, batch)
    fetch_sync(loss, state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step_fn(state, batch)
    fetch_sync(loss, state)
    return (time.perf_counter() - t0) / iters, state


def chip_probe_tflops(n: int = 4096, depth: int = 4, reps: int = 3) -> float:
    """The chip's CURRENT effective matmul throughput (TF/s, bf16 inputs)
    from a chain of dependent n^3 matmuls, fetch-synced (``fetch_sync``).
    Shared-tenancy chips throttle >20x across hours — probe in the same run
    as any measurement you intend to normalize."""
    import numpy as np
    import jax.numpy as jnp

    key = jax.random.key(0)
    x = (jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def chain(y, x):
        for _ in range(depth):
            y = y @ x
        return y

    y = chain(x, x)
    fetch_sync(y)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(y, x)
        fetch_sync(y)
        best = min(best, time.perf_counter() - t0)
    return 2 * n**3 * depth / best / 1e12


def chip_probe_gbps(mb: int = 64, depth: int = 4, reps: int = 3) -> float:
    """The chip's CURRENT effective HBM bandwidth (GB/s) from a chain of
    dependent saxpys (throttling is NON-uniform: HBM has been observed 24x
    down while the MXU was only 4x down)."""
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    a = jnp.ones((n,), jnp.float32) * 1.00001
    b = jnp.ones((n,), jnp.float32) * 0.5

    @jax.jit
    def chain(a, b):
        for _ in range(depth):
            a = a * 0.999 + b * 0.001
        return a

    a = chain(a, b)
    fetch_sync(a)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a = chain(a, b)
        fetch_sync(a)
        best = min(best, time.perf_counter() - t0)
    return 3 * n * 4 * depth / best / 1e9
