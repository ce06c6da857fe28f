"""Gaussian-mixture output sampling, vectorized for TPU.

Re-implements the semantics of the reference's per-node GMM samplers
(``graphphysics/models/simulator.py:13-125``) without the torch idioms: the
per-component python loop with boolean-mask gathers becomes a single
``jnp.take_along_axis`` after a vectorized ``jax.random.categorical`` draw
(the JAX analog of ``torch.multinomial`` on each node's mixture weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gmm_diagonal(
    rng: jax.Array,
    network_output: jax.Array,
    d: int,
    K: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Sample per-node velocities from a diagonal-covariance GMM.

    Layout per component (reference ``simulator.py:13-57``):
    ``[logit, mean(d), log_std(d)]`` -> per_comp = 2d + 1.

    Args:
        rng: PRNG key.
        network_output: ``[N, K * (2d + 1)]``.

    Returns:
        ``[N, d]`` samples ``mean + temperature * exp(log_std) * z``.
    """
    n = network_output.shape[0]
    per_comp = 2 * d + 1
    net = network_output.reshape(n, K, per_comp)
    logit = net[..., 0]  # [N, K]
    means = net[..., 1 : 1 + d]  # [N, K, d]
    log_std = net[..., 1 + d : 1 + 2 * d]  # [N, K, d]

    k_rng, z_rng = jax.random.split(rng)
    comp_ids = jax.random.categorical(k_rng, logit, axis=-1)  # [N]
    take = lambda a: jnp.take_along_axis(a, comp_ids[:, None, None], axis=1)[:, 0, :]
    chosen_means = take(means)  # [N, d]
    chosen_std = jnp.exp(take(log_std)) * temperature  # [N, d]

    z = jax.random.normal(z_rng, (n, d), dtype=network_output.dtype)
    return chosen_means + chosen_std * z


def sample_gmm(
    rng: jax.Array,
    network_output: jax.Array,
    d: int,
    K: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Sample per-node velocities from a full-covariance GMM.

    Layout per component (reference ``simulator.py:60-125``):
    ``[logit, mean(d), tril(L)(d(d+1)/2)]``; sample = ``mean + (T*L) @ z``.
    """
    n = network_output.shape[0]
    l_len = (d * (d + 1)) // 2
    per_comp = 1 + d + l_len
    net = network_output.reshape(n, K, per_comp)
    logit = net[..., 0]
    means = net[..., 1 : 1 + d]  # [N, K, d]
    l_flat = net[..., 1 + d : 1 + d + l_len]  # [N, K, l_len]

    rows, cols = jnp.tril_indices(d)
    l_mat = jnp.zeros((n, K, d, d), network_output.dtype)
    l_mat = l_mat.at[..., rows, cols].set(l_flat) * temperature

    k_rng, z_rng = jax.random.split(rng)
    comp_ids = jax.random.categorical(k_rng, logit, axis=-1)  # [N]
    chosen_means = jnp.take_along_axis(means, comp_ids[:, None, None], axis=1)[:, 0]
    chosen_l = jnp.take_along_axis(
        l_mat, comp_ids[:, None, None, None], axis=1
    )[:, 0]  # [N, d, d]

    z = jax.random.normal(z_rng, (n, d), dtype=network_output.dtype)
    return chosen_means + jnp.einsum(
        "nij,nj->ni", chosen_l, z, preferred_element_type=network_output.dtype
    )
