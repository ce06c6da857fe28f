"""MeshMask static-shape utilities (reference tests/graphphysics/utils/
test_meshmask.py analog: edge filtering + reconstruct with mask tokens)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.utils.meshmask import (
    build_masked_graph,
    reconstruct_graph,
    visible_edge_mask,
)
from tests.conftest import make_test_graph


def _graph():
    g = make_test_graph()
    return jax.tree_util.tree_map(jnp.asarray, g)


def test_visible_edge_mask_drops_hidden_endpoints(rng):
    g = _graph()
    keep = jnp.asarray(rng.random(g.num_nodes) > 0.3)
    em = np.asarray(visible_edge_mask(g, keep))
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    k = np.asarray(keep)
    base = np.asarray(g.edge_mask)
    np.testing.assert_array_equal(em, k[s] & k[r] & base)


def test_build_masked_graph_masks_nodes_and_edges(rng):
    g = _graph()
    keep = jnp.asarray(rng.random(g.num_nodes) > 0.3)
    masked, edges_visible = build_masked_graph(g, keep)
    assert masked.x.shape == g.x.shape  # static shapes preserved
    np.testing.assert_array_equal(
        np.asarray(masked.node_mask),
        np.asarray(g.node_mask) & np.asarray(keep),
    )
    np.testing.assert_array_equal(
        np.asarray(masked.edge_mask), np.asarray(edges_visible)
    )


def test_reconstruct_substitutes_mask_tokens(rng):
    g = _graph()
    f = g.x.shape[1]
    keep = jnp.asarray(rng.random(g.num_nodes) > 0.5)
    latent = jnp.asarray(rng.normal(size=(g.num_nodes, f)).astype(np.float32))
    token = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    _, edges_visible = build_masked_graph(g, keep)

    fe = g.edge_attr.shape[1]
    latent_ea = jnp.asarray(rng.normal(size=(g.num_edges, fe)).astype(np.float32))
    encoded_raw = jnp.asarray(rng.normal(size=(g.num_edges, fe)).astype(np.float32))
    e_token = jnp.asarray(rng.normal(size=(fe,)).astype(np.float32))

    out = reconstruct_graph(
        g, latent, keep, token,
        edges_visible=edges_visible,
        latent_edge_attr=latent_ea,
        encoded_raw_edge_attr=encoded_raw,
        edge_mask_token=e_token,
    )
    k = np.asarray(keep)
    np.testing.assert_allclose(np.asarray(out.x)[k], np.asarray(latent)[k])
    np.testing.assert_allclose(
        np.asarray(out.x)[~k],
        np.tile(np.asarray(token), (int((~k).sum()), 1)),
    )
    ev = np.asarray(edges_visible)
    np.testing.assert_allclose(
        np.asarray(out.edge_attr)[ev], np.asarray(latent_ea)[ev]
    )
    np.testing.assert_allclose(
        np.asarray(out.edge_attr)[~ev],
        np.asarray(encoded_raw)[~ev] + np.asarray(e_token),
        rtol=1e-6,
    )
