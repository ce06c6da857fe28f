"""Processor architectures: EncodeProcessDecode and EncodeTransformDecode.

Re-implementations of ``graphphysics/models/processors.py:27-277`` on static
padded graphs. Both operate on a single graph's arrays; batch via ``jax.vmap``
in the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.models.layers import (
    MLP,
    DiagonalGMMHead,
    GMMHead,
    GraphNetBlock,
    TransformerBlock,
)

# Non-array __call__ arguments that ``nn.remat`` must treat as static
# (indices count ``self`` as 0; flax shifts them down by one internally).
# ``ell_degree`` / ``csr_max_chunks`` are Python ints used as shapes, and
# ``partition_axis`` is a mesh-axis *name* (str) — jax.checkpoint cannot
# trace any of them as pytree leaves.
_GNB_STATICS = (6, 8, 10)  # ell_degree, partition_axis, halo_dtype
# ell_degree, partition_axis, csr_max_chunks, halo_dtype, num_local_edges
_TFB_STATICS = (5, 7, 10, 11, 13)


class _ScannedGraphNetStack(nn.Module):
    """One GraphNetBlock applied as the body of an ``nn.scan`` over the
    layer axis: params get a leading ``[L]`` dim and the compiled HLO holds
    ONE block body instead of L unrolled copies — compile time becomes
    O(1) in depth (``scan_blocks`` knob). Same math as the unrolled loop."""

    hidden_size: int
    ell_degree: Any = None
    partition_axis: Any = None
    dtype: Any = None
    remat: bool = False
    halo_dtype: Any = None

    @nn.compact
    def __call__(self, carry, senders, receivers, edge_mask, twin_perm,
                 halo_send_idx):
        x, edge_attr = carry
        block_cls = (
            nn.remat(GraphNetBlock, static_argnums=_GNB_STATICS)
            if self.remat else GraphNetBlock
        )
        x, edge_attr = block_cls(
            hidden_size=self.hidden_size, dtype=self.dtype, name="block"
        )(x, edge_attr, senders, receivers, edge_mask, self.ell_degree,
          twin_perm, self.partition_axis, halo_send_idx, self.halo_dtype)
        return (x, edge_attr), None


class _ScannedTransformerStack(nn.Module):
    """TransformerBlock scan body (see ``_ScannedGraphNetStack``)."""

    output_dim: int
    num_heads: int
    use_proj_bias: bool
    use_separate_proj_weight: bool
    ell_degree: Any = None
    partition_axis: Any = None
    dtype: Any = None
    remat: bool = False

    csr_max_chunks: Any = None
    halo_dtype: Any = None
    num_local_edges: Any = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, twin_perm,
                 halo_send_idx, csr_bounds, csr_bounds_halo):
        block_cls = (
            nn.remat(TransformerBlock, static_argnums=_TFB_STATICS)
            if self.remat else TransformerBlock
        )
        x = block_cls(
            output_dim=self.output_dim,
            num_heads=self.num_heads,
            use_proj_bias=self.use_proj_bias,
            use_separate_proj_weight=self.use_separate_proj_weight,
            dtype=self.dtype,
            name="block",
        )(x, senders, receivers, edge_mask, self.ell_degree, twin_perm,
          self.partition_axis, halo_send_idx, csr_bounds,
          self.csr_max_chunks, self.halo_dtype, csr_bounds_halo,
          self.num_local_edges)
        return x, None


def _scan_stack(body_cls, length: int, name: str, **body_kwargs):
    scanned = nn.scan(
        body_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=nn.broadcast,
        out_axes=0,
        length=length,
    )
    return scanned(name=name, **body_kwargs)


def _decoder(
    hidden_size, output_size, num_mixture_components, use_diagonal, dtype, name
):
    """Regular MLP decoder (no output norm) or a GMM head, per
    ``processors.py:84-105``. The decoder computes in ``dtype`` but always
    emits float32 predictions."""
    if num_mixture_components == 0:
        return MLP(
            hidden_size=hidden_size,
            out_size=output_size,
            layer_norm=False,
            dtype=dtype,
            name=name,
        )
    head = DiagonalGMMHead if use_diagonal else GMMHead
    return head(
        d=output_size, num_components=num_mixture_components, dtype=dtype, name=name
    )


class EncodeProcessDecode(nn.Module):
    """MeshGraphNet-style EPD (``processors.py:27-137``): MLP encoders for
    nodes and edges, N GraphNetBlocks, MLP (or GMM) decoder."""

    message_passing_num: int
    node_input_size: int
    edge_input_size: int
    output_size: int
    hidden_size: int = 128
    only_processor: bool = False
    num_mixture_components: int = 0
    temperature: Optional[float] = None
    use_diagonal: bool = True
    remat: bool = False
    scan_blocks: bool = False  # lax.scan over layers: O(1)-in-depth compiles
    dtype: Any = None  # compute dtype (bf16 for TPU speed); params & outputs f32

    @property
    def d(self) -> int:
        return self.output_size

    @property
    def K(self) -> int:
        return self.num_mixture_components

    @nn.compact
    def __call__(self, graph: Graph) -> jax.Array:
        x, edge_attr = graph.x, graph.edge_attr
        if not self.only_processor:
            x = MLP(
                self.hidden_size, self.hidden_size, dtype=self.dtype,
                name="nodes_encoder",
            )(x)
            edge_attr = MLP(
                self.hidden_size, self.hidden_size, dtype=self.dtype,
                name="edges_encoder",
            )(edge_attr)

        if self.scan_blocks:
            # NOTE: params live under blocks/block/... with a leading [L]
            # axis — a different checkpoint layout than the unrolled loop.
            (x, edge_attr), _ = _scan_stack(
                _ScannedGraphNetStack, self.message_passing_num, "blocks",
                hidden_size=self.hidden_size, ell_degree=graph.ell_degree,
                partition_axis=graph.partition_axis, dtype=self.dtype,
                remat=self.remat, halo_dtype=graph.halo_dtype,
            )((x, edge_attr), graph.senders, graph.receivers,
              graph.edge_mask, graph.twin_perm, graph.halo_send_idx)
        else:
            block_cls = (
                nn.remat(GraphNetBlock, static_argnums=_GNB_STATICS)
                if self.remat else GraphNetBlock
            )
            for i in range(self.message_passing_num):
                x, edge_attr = block_cls(
                    hidden_size=self.hidden_size, dtype=self.dtype,
                    name=f"block_{i}",
                )(
                    x,
                    edge_attr,
                    graph.senders,
                    graph.receivers,
                    graph.edge_mask,
                    graph.ell_degree,
                    graph.twin_perm,
                    graph.partition_axis,
                    graph.halo_send_idx,
                    graph.halo_dtype,
                )

        if self.only_processor:
            return x
        out = _decoder(
            self.hidden_size,
            self.output_size,
            self.num_mixture_components,
            self.use_diagonal,
            self.dtype,
            name="decode_module",
        )(x)
        return out.astype(jnp.float32)


class EncodeTransformDecode(nn.Module):
    """Sparse graph transformer (``processors.py:140-277``): MLP node encoder,
    N pre-norm TransformerBlocks attending over the mesh adjacency, MLP (or
    GMM) decoder. Edge features are not used (``edge_input_size == 0``)."""

    message_passing_num: int
    node_input_size: int
    output_size: int
    hidden_size: int = 128
    num_heads: int = 4
    only_processor: bool = False
    use_proj_bias: bool = True
    use_separate_proj_weight: bool = True
    num_mixture_components: int = 0
    temperature: Optional[float] = None
    use_diagonal: bool = True
    remat: bool = False
    scan_blocks: bool = False  # lax.scan over layers: O(1)-in-depth compiles
    dtype: Any = None  # compute dtype (bf16 for TPU speed); params & outputs f32

    @property
    def d(self) -> int:
        return self.output_size

    @property
    def K(self) -> int:
        return self.num_mixture_components

    @nn.compact
    def __call__(self, graph: Graph) -> jax.Array:
        x = graph.x
        if not self.only_processor:
            x = MLP(
                self.hidden_size, self.hidden_size, dtype=self.dtype,
                name="nodes_encoder",
            )(x)

        if self.scan_blocks:
            x, _ = _scan_stack(
                _ScannedTransformerStack, self.message_passing_num, "blocks",
                output_dim=self.hidden_size, num_heads=self.num_heads,
                use_proj_bias=self.use_proj_bias,
                use_separate_proj_weight=self.use_separate_proj_weight,
                ell_degree=graph.ell_degree,
                partition_axis=graph.partition_axis, dtype=self.dtype,
                remat=self.remat, csr_max_chunks=graph.csr_max_chunks,
                halo_dtype=graph.halo_dtype,
                num_local_edges=graph.num_local_edges,
            )(x, graph.senders, graph.receivers, graph.edge_mask,
              graph.twin_perm, graph.halo_send_idx, graph.csr_bounds,
              graph.csr_bounds_halo)
        else:
            block_cls = (
                nn.remat(TransformerBlock, static_argnums=_TFB_STATICS)
                if self.remat else TransformerBlock
            )
            for i in range(self.message_passing_num):
                x = block_cls(
                    output_dim=self.hidden_size,
                    num_heads=self.num_heads,
                    use_proj_bias=self.use_proj_bias,
                    use_separate_proj_weight=self.use_separate_proj_weight,
                    dtype=self.dtype,
                    name=f"block_{i}",
                )(
                    x,
                    graph.senders,
                    graph.receivers,
                    graph.edge_mask,
                    graph.ell_degree,
                    graph.twin_perm,
                    graph.partition_axis,
                    graph.halo_send_idx,
                    graph.csr_bounds,
                    graph.csr_max_chunks,
                    graph.halo_dtype,
                    graph.csr_bounds_halo,
                    graph.num_local_edges,
                )

        if self.only_processor:
            return x
        out = _decoder(
            self.hidden_size,
            self.output_size,
            self.num_mixture_components,
            self.use_diagonal,
            self.dtype,
            name="decode_module",
        )(x)
        return out.astype(jnp.float32)
