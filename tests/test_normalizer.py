"""Normalizer statistics tests (mirrors the statistical assertions of the
reference tests/graphphysics/models/test_layers.py:107-116)."""

import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core import normalizer as norm


def test_normalizer_converges_to_unit_stats(rng):
    state = norm.init(4)
    data = rng.normal(loc=3.0, scale=2.5, size=(100, 64, 4)).astype(np.float32)
    for i in range(100):
        state, _ = norm.normalize(state, jnp.array(data[i]), accumulate_stats=True)
    _, out = norm.normalize(state, jnp.array(data.reshape(-1, 4)))
    normalized = np.asarray(out)
    np.testing.assert_allclose(normalized.mean(axis=0), 0.0, atol=0.05)
    np.testing.assert_allclose(normalized.std(axis=0), 1.0, atol=0.05)


def test_normalizer_inverse_roundtrip(rng):
    state = norm.init(3)
    data = jnp.array(rng.normal(size=(50, 3)).astype(np.float32) * 4 + 1)
    state, out = norm.normalize(state, data, accumulate_stats=True)
    rec = norm.inverse(state, out)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(data), rtol=1e-4, atol=1e-4)


def test_normalizer_mask_excludes_padding(rng):
    valid = rng.normal(size=(32, 2)).astype(np.float32)
    padded = np.concatenate([valid, np.full((16, 2), 1e6, np.float32)])
    mask = np.array([True] * 32 + [False] * 16)

    s_masked = norm.accumulate(norm.init(2), jnp.array(padded), jnp.array(mask))
    s_clean = norm.accumulate(norm.init(2), jnp.array(valid))
    np.testing.assert_allclose(
        np.asarray(norm.mean(s_masked)), np.asarray(norm.mean(s_clean)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(norm.std_with_epsilon(s_masked)),
        np.asarray(norm.std_with_epsilon(s_clean)),
        rtol=1e-5,
    )


def test_normalizer_stops_after_max_accumulations():
    state = norm.init(1)
    state = state.__class__(
        acc_count=state.acc_count,
        num_accumulations=jnp.asarray(float(norm.MAX_ACCUMULATIONS)),
        acc_sum=state.acc_sum,
        acc_sum_sq=state.acc_sum_sq,
    )
    before = state
    state = norm.accumulate(state, jnp.ones((8, 1)))
    assert float(state.acc_count) == float(before.acc_count)
    assert float(state.num_accumulations) == float(norm.MAX_ACCUMULATIONS)
