"""Pallas CSR segment-sum kernel: interpret-mode correctness on CPU.
(Real-TPU parity + perf measured in bench/verification runs.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from graphphysics_tpu.ops.pallas_segment import (
    compute_block_offsets,
    compute_max_chunks,
    csr_segment_sum,
)


def _case(n, e, h, seed=0):
    r = np.random.default_rng(seed)
    recv = np.sort(r.integers(0, n, e)).astype(np.int32)
    data = r.normal(size=(e, h)).astype(np.float32)
    offsets = compute_block_offsets(recv, n)
    mc = compute_max_chunks(offsets)
    return data, recv, offsets, mc


@pytest.mark.parametrize("n,e", [(1024, 4096), (512, 1000), (300, 2048)])
def test_matches_segment_sum(n, e):
    data, recv, offsets, mc = _case(n, e, 128)
    with pltpu.force_tpu_interpret_mode():
        out = csr_segment_sum(
            jnp.asarray(data), jnp.asarray(recv), jnp.asarray(offsets), n,
            max_chunks=mc,
        )
    expected = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(recv),
                                   num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-4)


def test_skewed_distribution():
    # all edges into few nodes: busiest block needs many chunks
    n, e, h = 1024, 4096, 64
    r = np.random.default_rng(1)
    recv = np.sort(r.integers(0, 8, e)).astype(np.int32)
    data = r.normal(size=(e, h)).astype(np.float32)
    offsets = compute_block_offsets(recv, n)
    mc = compute_max_chunks(offsets)
    with pltpu.force_tpu_interpret_mode():
        out = csr_segment_sum(
            jnp.asarray(data), jnp.asarray(recv), jnp.asarray(offsets), n,
            max_chunks=mc,
        )
    expected = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(recv),
                                   num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-3)


def test_gradient_is_gather():
    n, e, h = 256, 1024, 32
    data, recv, offsets, mc = _case(n, e, h, seed=2)
    dj, rj, oj = jnp.asarray(data), jnp.asarray(recv), jnp.asarray(offsets)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda d: (csr_segment_sum(d, rj, oj, n, max_chunks=mc) ** 2).sum()
        )(dj)
    out = jax.ops.segment_sum(dj, rj, num_segments=n)
    expected = 2.0 * jnp.take(out, rj, axis=0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected),
                               rtol=1e-4, atol=1e-3)
