"""Masked losses on static padded graphs.

Re-implementations of the reference losses (``graphphysics/utils/loss.py``)
with one structural change: instead of boolean fancy-indexing (dynamic shapes),
each loss computes a masked mean with static shapes — identical numerics, XLA
friendly. The mask combines:

- node-type membership in ``masks`` (reference ``_prepare_mask_for_loss``,
  ``loss.py:10-25``),
- exclusion of MeshMask-``selected_indexes`` nodes (provided as a boolean
  ``exclude_mask`` here since index lists are dynamic),
- the padding ``node_mask`` of the static graph (new; padding never existed
  in the reference).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * 3.141592653589793


def node_type_mask(
    node_type: jax.Array,
    masks: Sequence[int],
    node_valid: Optional[jax.Array] = None,
    exclude_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Boolean [N] mask: node_type in ``masks``, valid, and not excluded."""
    m = jnp.zeros_like(node_type, dtype=bool)
    for t in masks:
        m = jnp.logical_or(m, node_type == int(t))
    if node_valid is not None:
        m = jnp.logical_and(m, node_valid)
    if exclude_mask is not None:
        m = jnp.logical_and(m, jnp.logical_not(exclude_mask))
    return m


def _masked_row_mean(per_row: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of per-row scalars over masked rows (0 if mask empty)."""
    w = mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_local_loss(masks: Sequence[int], loss_kind: str, gmm_kwargs=None):
    """Build a local (sum, count) loss for count-weighted reductions — the
    shared kernel of the sharded (``parallel.dp``) and microbatched
    (``training.microbatch``) train steps: summing the per-shard sums and
    counts reproduces the single-device masked mean exactly."""
    masks = [int(m) for m in masks]
    gmm_kwargs = gmm_kwargs or {}

    def local_loss(target, out, node_type, node_valid, exclude_mask):
        mask = node_type_mask(node_type, masks, node_valid, exclude_mask)
        if loss_kind == "l2":
            per_row = jnp.mean((out - target) ** 2, axis=-1)
        elif loss_kind == "diag_gmm":
            per_row = diagonal_gmm_nll_per_row(target, out, **gmm_kwargs)
        elif loss_kind == "full_gmm":
            per_row = gmm_nll_per_row(target, out, **gmm_kwargs)
        else:
            raise ValueError(loss_kind)
        w = mask.astype(per_row.dtype)
        return jnp.sum(per_row * w), jnp.sum(w)

    return local_loss


def l2_loss(
    target: jax.Array,
    network_output: jax.Array,
    node_type: jax.Array,
    masks: Sequence[int],
    node_valid: Optional[jax.Array] = None,
    exclude_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """MSE over the masked nodes' feature elements (reference ``L2Loss``,
    ``loss.py:28-65``: mean over all elements of the selected rows)."""
    mask = node_type_mask(node_type, masks, node_valid, exclude_mask)
    per_row = jnp.mean((network_output - target) ** 2, axis=-1)
    return _masked_row_mean(per_row, mask)


def l1_smooth_loss(
    target: jax.Array,
    network_output: jax.Array,
    node_type: jax.Array,
    masks: Sequence[int],
    beta: float = 1.0,
    node_valid: Optional[jax.Array] = None,
    exclude_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Huber / smooth-L1 (reference ``L1SmoothLoss``, ``loss.py:68-108``)."""
    mask = node_type_mask(node_type, masks, node_valid, exclude_mask)
    diff = jnp.abs(network_output - target)
    elem = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    per_row = jnp.mean(elem, axis=-1)
    return _masked_row_mean(per_row, mask)


def diagonal_gmm_nll_per_row(
    target: jax.Array,
    network_output: jax.Array,
    d: int,
    K: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Per-node diagonal-GMM negative log-likelihood ([N]); the shared core
    of the masked loss below and the data-parallel step's local loss."""
    n = network_output.shape[0]
    per_comp = 2 * d + 1
    net = network_output.reshape(n, K, per_comp)
    logit = net[..., 0]
    alpha = jax.nn.softmax(logit, axis=-1)
    means = net[..., 1 : 1 + d]
    log_std = net[..., 1 + d : 1 + 2 * d]

    x = target[:, None, :]  # [N, 1, d]
    diff = x - means  # [N, K, d]
    std = jnp.exp(log_std) * temperature
    var = std**2
    log_component = -0.5 * (
        2.0 * jnp.log(std + 1e-12) + diff**2 / (var + 1e-12) + jnp.log(_TWO_PI)
    )
    log_component = jnp.sum(log_component, axis=-1)  # [N, K]
    log_mixture = jnp.log(alpha + 1e-12) + log_component
    return -jax.scipy.special.logsumexp(log_mixture, axis=-1)  # [N]


def diagonal_gmm_nll_loss(
    target: jax.Array,
    network_output: jax.Array,
    node_type: jax.Array,
    masks: Sequence[int],
    d: int,
    K: int,
    temperature: float = 1.0,
    node_valid: Optional[jax.Array] = None,
    exclude_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Diagonal-covariance GMM NLL (reference ``loss.py:111-199``), computed
    on all rows then mean-reduced over the mask."""
    mask = node_type_mask(node_type, masks, node_valid, exclude_mask)
    nll = diagonal_gmm_nll_per_row(target, network_output, d, K, temperature)
    return _masked_row_mean(nll, mask)


def gmm_nll_loss(
    target: jax.Array,
    network_output: jax.Array,
    node_type: jax.Array,
    masks: Sequence[int],
    d: int,
    K: int,
    temperature: float = 1.0,
    node_valid: Optional[jax.Array] = None,
    exclude_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-covariance GMM NLL via lower-triangular solve (reference
    ``loss.py:202-327``)."""
    mask = node_type_mask(node_type, masks, node_valid, exclude_mask)
    nll = gmm_nll_per_row(target, network_output, d, K, temperature)
    return _masked_row_mean(nll, mask)


def gmm_nll_per_row(
    target: jax.Array,
    network_output: jax.Array,
    d: int,
    K: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Per-node full-covariance GMM NLL ([N]) — the shared core of the
    masked loss above and the sharded/microbatched local losses."""
    n = network_output.shape[0]
    l_len = (d * (d + 1)) // 2
    per_comp = 1 + d + l_len
    net = network_output.reshape(n, K, per_comp)
    logit = net[..., 0]
    alpha = jax.nn.softmax(logit, axis=-1)
    means = net[..., 1 : 1 + d]
    l_flat = net[..., 1 + d : 1 + d + l_len]

    rows, cols = jnp.tril_indices(d)
    l_mat = jnp.zeros((n, K, d, d), network_output.dtype)
    l_mat = l_mat.at[..., rows, cols].set(l_flat) * temperature

    diff = target[:, None, :] - means  # [N, K, d]
    diag_l = jnp.diagonal(l_mat, axis1=-2, axis2=-1)  # [N, K, d]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(diag_l) + 1e-8), axis=-1)  # [N, K]

    # Guard padded / degenerate rows so the solve stays finite (masked later).
    eye = jnp.eye(d, dtype=l_mat.dtype)
    safe_l = jnp.where(jnp.abs(diag_l)[..., None] < 1e-8, l_mat + 1e-4 * eye, l_mat)
    y = jax.lax.linalg.triangular_solve(
        safe_l, diff[..., None], left_side=True, lower=True
    )[..., 0]
    maha = jnp.sum(y**2, axis=-1)  # [N, K]

    logpdf = -0.5 * (d * jnp.log(_TWO_PI) + logdet + maha)
    log_mixture = jnp.log(alpha + 1e-12) + logpdf
    log_prob_x = jax.scipy.special.logsumexp(log_mixture, axis=-1)
    return -log_prob_x
