"""GMM sampler tests (statistical, mirroring the reference
tests/graphphysics/models/test_gmm_sampler.py approach)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.models.gmm import sample_gmm, sample_gmm_diagonal


def test_diagonal_sampler_shapes_and_temperature_zero(rng):
    n, d, K = 32, 3, 4
    net = rng.normal(size=(n, K * (2 * d + 1))).astype(np.float32)
    out = sample_gmm_diagonal(jax.random.key(0), jnp.array(net), d=d, K=K)
    assert out.shape == (n, d)

    # temperature 0 -> exact component means
    out0 = np.asarray(
        sample_gmm_diagonal(jax.random.key(0), jnp.array(net), d=d, K=K, temperature=0.0)
    )
    net3 = net.reshape(n, K, 2 * d + 1)
    means = net3[..., 1 : 1 + d]
    # each row must equal one of its component means
    for i in range(n):
        dists = np.abs(means[i] - out0[i]).max(axis=-1)
        assert dists.min() < 1e-5


def test_diagonal_sampler_single_component_statistics(rng):
    n, d = 4000, 2
    mean = np.array([1.5, -2.0], np.float32)
    log_std = np.log(np.array([0.5, 2.0], np.float32))
    net = np.concatenate(
        [np.zeros((n, 1)), np.tile(mean, (n, 1)), np.tile(log_std, (n, 1))], axis=1
    ).astype(np.float32)
    out = np.asarray(
        sample_gmm_diagonal(jax.random.key(3), jnp.array(net), d=d, K=1)
    )
    np.testing.assert_allclose(out.mean(axis=0), mean, atol=0.15)
    np.testing.assert_allclose(out.std(axis=0), np.exp(log_std), atol=0.15)


def test_full_sampler_matches_cholesky_covariance(rng):
    n, d = 6000, 2
    mean = np.array([0.5, 1.0], np.float32)
    L = np.array([[1.0, 0.0], [0.8, 0.6]], np.float32)
    tril = np.array([L[0, 0], L[1, 0], L[1, 1]], np.float32)
    net = np.concatenate(
        [np.zeros((n, 1)), np.tile(mean, (n, 1)), np.tile(tril, (n, 1))], axis=1
    ).astype(np.float32)
    out = np.asarray(sample_gmm(jax.random.key(5), jnp.array(net), d=d, K=1))
    cov = np.cov(out.T)
    np.testing.assert_allclose(out.mean(axis=0), mean, atol=0.1)
    np.testing.assert_allclose(cov, L @ L.T, atol=0.15)
