"""Loss tests: parity against dense boolean-indexed computation (the
reference's fancy-indexing form, graphphysics/utils/loss.py)."""

import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.training.losses import (
    diagonal_gmm_nll_loss,
    gmm_nll_loss,
    l1_smooth_loss,
    l2_loss,
)


def _data(rng, n=40, d=3):
    target = rng.normal(size=(n, d)).astype(np.float32)
    out = rng.normal(size=(n, d)).astype(np.float32)
    node_type = rng.integers(0, 7, size=n).astype(np.float32)
    return target, out, node_type


def test_l2_matches_dense_indexing(rng):
    target, out, node_type = _data(rng)
    masks = [NodeType.NORMAL, NodeType.OUTFLOW]
    got = float(
        l2_loss(jnp.array(target), jnp.array(out), jnp.array(node_type), masks)
    )
    sel = np.isin(node_type, [int(m) for m in masks])
    expected = ((out - target) ** 2)[sel].mean()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_l2_exclude_mask(rng):
    target, out, node_type = _data(rng)
    masks = [NodeType.NORMAL]
    exclude = rng.random(len(node_type)) > 0.5
    got = float(
        l2_loss(
            jnp.array(target),
            jnp.array(out),
            jnp.array(node_type),
            masks,
            exclude_mask=jnp.array(exclude),
        )
    )
    sel = (node_type == int(NodeType.NORMAL)) & ~exclude
    expected = ((out - target) ** 2)[sel].mean() if sel.any() else 0.0
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_l1_smooth_matches_dense(rng):
    target, out, node_type = _data(rng)
    masks = [NodeType.NORMAL, NodeType.OUTFLOW]
    beta = 0.7
    got = float(
        l1_smooth_loss(
            jnp.array(target), jnp.array(out), jnp.array(node_type), masks, beta=beta
        )
    )
    sel = np.isin(node_type, [int(m) for m in masks])
    diff = np.abs(out - target)
    elem = np.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    expected = elem[sel].mean()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def _dense_diag_nll(target, net, node_type, masks, d, K, temperature):
    sel = np.isin(node_type, [int(m) for m in masks])
    t, n3 = target[sel], net[sel].reshape(-1, K, 2 * d + 1)
    logit = n3[..., 0]
    alpha = np.exp(logit - logit.max(-1, keepdims=True))
    alpha = alpha / alpha.sum(-1, keepdims=True)
    means = n3[..., 1 : 1 + d]
    log_std = n3[..., 1 + d : 1 + 2 * d]
    std = np.exp(log_std) * temperature
    diff = t[:, None, :] - means
    log_comp = -0.5 * (
        2 * np.log(std + 1e-12) + diff**2 / (std**2 + 1e-12) + np.log(2 * np.pi)
    )
    log_comp = log_comp.sum(-1)
    lm = np.log(alpha + 1e-12) + log_comp
    mx = lm.max(-1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lm - mx).sum(-1))
    return -lse.mean()


def test_diag_gmm_nll_matches_dense(rng):
    d, K, n = 2, 3, 30
    target = rng.normal(size=(n, d)).astype(np.float32)
    net = rng.normal(size=(n, K * (2 * d + 1))).astype(np.float32)
    node_type = rng.integers(0, 7, size=n).astype(np.float32)
    masks = [NodeType.NORMAL, NodeType.OUTFLOW]
    got = float(
        diagonal_gmm_nll_loss(
            jnp.array(target), jnp.array(net), jnp.array(node_type), masks,
            d=d, K=K, temperature=1.0,
        )
    )
    expected = _dense_diag_nll(target, net, node_type, masks, d, K, 1.0)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_full_gmm_nll_finite_and_reasonable(rng):
    d, K, n = 3, 2, 25
    l_len = d * (d + 1) // 2
    target = rng.normal(size=(n, d)).astype(np.float32)
    net = rng.normal(size=(n, K * (1 + d + l_len))).astype(np.float32)
    # keep diagonals away from zero for a well-posed covariance
    node_type = np.zeros(n, np.float32)
    got = float(
        gmm_nll_loss(
            jnp.array(target), jnp.array(net), jnp.array(node_type),
            [NodeType.NORMAL], d=d, K=K,
        )
    )
    assert np.isfinite(got)


def test_full_gmm_nll_matches_diag_when_diagonal(rng):
    """With L diagonal, full-cov NLL equals diagonal NLL with log_std = log|L_ii|."""
    d, K, n = 2, 2, 20
    target = rng.normal(size=(n, d)).astype(np.float32)
    logit = rng.normal(size=(n, K, 1)).astype(np.float32)
    means = rng.normal(size=(n, K, d)).astype(np.float32)
    diag = (0.5 + rng.random((n, K, d))).astype(np.float32)

    # full-cov layout: [logit, mean, tril] with tril = [L00, L10, L11] for d=2
    tril = np.zeros((n, K, 3), np.float32)
    tril[..., 0] = diag[..., 0]
    tril[..., 2] = diag[..., 1]
    full_net = np.concatenate([logit, means, tril], axis=-1).reshape(n, -1)

    diag_net = np.concatenate([logit, means, np.log(diag)], axis=-1).reshape(n, -1)

    node_type = np.zeros(n, np.float32)
    full = float(
        gmm_nll_loss(
            jnp.array(target), jnp.array(full_net), jnp.array(node_type),
            [NodeType.NORMAL], d=d, K=K,
        )
    )
    diag_v = float(
        diagonal_gmm_nll_loss(
            jnp.array(target), jnp.array(diag_net), jnp.array(node_type),
            [NodeType.NORMAL], d=d, K=K,
        )
    )
    np.testing.assert_allclose(full, diag_v, rtol=1e-3)
