"""Timing utilities (utils/profiling.py): the chained-step timer must
synchronize by FETCHING result data (block_until_ready has been observed to
return early through remote-tunnel backends) and thread state through the
chain."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.utils.profiling import (
    ThroughputMeter,
    fetch_sync,
    time_chained_steps,
)


def test_time_chained_steps_threads_state_and_times():
    @jax.jit
    def step(state, batch):
        new = state + batch.sum()
        return new, new[0]

    state = jnp.zeros((4,))
    batch = jnp.ones((8,))
    sec, out = time_chained_steps(step, state, batch, iters=5, warmup=2)
    assert sec > 0
    # 2 warmup + 5 timed dependent steps, each adds sum(batch) = 8
    np.testing.assert_allclose(np.asarray(out), np.full(4, 7 * 8.0))


def test_fetch_sync_handles_pytrees_and_scalars():
    fetch_sync(jnp.ones(()), {"a": jnp.arange(3), "b": None})
    fetch_sync((None,))  # no leaves — must not raise
    # zero-size first leaf: skip to the next fetchable leaf
    fetch_sync({"empty": jnp.zeros((0,)), "full": jnp.ones((2,))})
    fetch_sync(jnp.zeros((0, 3)))  # only empty leaves — must not raise


def test_throughput_meter():
    m = ThroughputMeter(edges_per_step=100, window=4)
    assert m.edges_per_sec == 0.0
    for _ in range(5):
        m.tick()
    assert m.steps_per_sec > 0
    assert m.edges_per_sec == m.steps_per_sec * 100
