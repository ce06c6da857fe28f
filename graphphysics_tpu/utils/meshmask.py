"""MeshMask (masked-autoencoder) utilities on static-shape graphs.

Re-design of the reference ``graphphysics/utils/meshmask.py:9-118``. The
reference *extracts* the visible subgraph (dynamic shapes); the TPU version
keeps every array at its padded static size and expresses masking with
boolean masks:

- ``build_masked_graph``: drop edges touching hidden nodes (edge mask AND of
  both endpoints' visibility) and mark hidden nodes invalid — message
  passing then behaves exactly like the reference's extracted subgraph for
  the visible nodes (hidden nodes are isolated; their features are ignored
  by downstream consumers).
- ``reconstruct_graph``: re-inflate by substituting a learnable [MASK] token
  for hidden nodes and re-encoded raw edge features + [MASK] token for
  dropped edges (reference ``reconstruct_graph``, ``meshmask.py:73-118``).

Like the reference, this is scaffolding for masked-pretraining variants; the
standard training path does not call it (reference ``parse_parameters.py:148-153``
defaults ``masking_ratio=None``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graphphysics_tpu.core.graph import Graph


def visible_edge_mask(graph: Graph, keep_mask: jax.Array) -> jax.Array:
    """Edges whose BOTH endpoints are visible (reference ``filter_edges``
    mask semantics, ``meshmask.py:29-32``), intersected with edge validity."""
    keep_s = jnp.take(keep_mask, graph.senders)
    keep_r = jnp.take(keep_mask, graph.receivers)
    m = jnp.logical_and(keep_s, keep_r)
    if graph.edge_mask is not None:
        m = jnp.logical_and(m, graph.edge_mask)
    return m


def build_masked_graph(graph: Graph, keep_mask: jax.Array) -> Tuple[Graph, jax.Array]:
    """Static-shape analog of reference ``build_masked_graph``
    (``meshmask.py:40-70``): same arrays, hidden nodes/edges masked out.

    Returns the masked graph and the pre-masking edge visibility (needed by
    ``reconstruct_graph``).
    """
    edges_visible = visible_edge_mask(graph, keep_mask)
    node_mask = jnp.logical_and(graph.node_mask, keep_mask)
    return graph.replace(node_mask=node_mask, edge_mask=edges_visible), edges_visible


def reconstruct_graph(
    graph: Graph,
    latent_x: jax.Array,
    keep_mask: jax.Array,
    node_mask_token: jax.Array,
    edges_visible: Optional[jax.Array] = None,
    latent_edge_attr: Optional[jax.Array] = None,
    encoded_raw_edge_attr: Optional[jax.Array] = None,
    edge_mask_token: Optional[jax.Array] = None,
) -> Graph:
    """Re-inflate a masked latent graph to full (static) size.

    Args:
        graph: the original full graph (topology + raw features).
        latent_x: ``[N, F]`` latent node features of the masked model run
            (valid on visible nodes; ignored elsewhere).
        keep_mask: ``[N]`` bool visibility.
        node_mask_token: ``[F]`` learnable [MASK] embedding.
        edges_visible: edge visibility from ``build_masked_graph``.
        latent_edge_attr: ``[E, Fe]`` latent edge features (visible edges).
        encoded_raw_edge_attr: ``[E, Fe]`` output of the edge encoder applied
            to the RAW edge features (reference applies ``edge_encoder`` then
            adds the token, ``meshmask.py:112-116``).
        edge_mask_token: ``[Fe]`` learnable edge [MASK] embedding.
    """
    x = jnp.where(keep_mask[:, None], latent_x, node_mask_token[None, :])
    edge_attr = graph.edge_attr
    if latent_edge_attr is not None:
        if (
            encoded_raw_edge_attr is None
            or edge_mask_token is None
            or edges_visible is None
        ):
            raise ValueError(
                "edge reconstruction needs edges_visible, "
                "encoded_raw_edge_attr, and edge_mask_token"
            )
        hidden_edges = encoded_raw_edge_attr + edge_mask_token[None, :]
        edge_attr = jnp.where(
            edges_visible[:, None], latent_edge_attr, hidden_edges
        )
    return graph.replace(x=x, edge_attr=edge_attr, edge_mask=graph.edge_mask)
