"""Core neural layers (flax.linen), numerically matching the reference.

Each layer documents the reference symbol it re-implements
(``graphphysics/models/layers.py``). Design deltas from the torch code are
TPU-idiomatic only: static shapes, masked segment ops instead of
torch-scatter/DGL, and pure-functional parameters.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphphysics_tpu.ops import masked_segment_sum, sparse_graph_attention
from graphphysics_tpu.ops.segment import take_rows
from graphphysics_tpu.ops.halo import partitioned_gather
from graphphysics_tpu.ops.ell_ops import ell_gather, ell_repeat, ell_segment_sum


class RMSNorm(nn.Module):
    """Root-mean-square layer norm, exact formula of reference
    ``layers.py:18-74``: ``scale * x / (||x|| * d^-0.5 + eps)`` with optional
    partial-p and bias."""

    dim: int
    p: float = -1.0
    eps: float = 1e-8
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))

        def safe_norm(v):
            # ||v|| with a zero (not NaN) gradient at v == 0 — matches torch's
            # norm subgradient; an all-zero row is reachable through ReLU.
            sq = jnp.sum(v * v, axis=-1, keepdims=True)
            return jnp.sqrt(jnp.maximum(sq, 1e-24))

        if self.p < 0.0 or self.p > 1.0:
            norm_x = safe_norm(x)
            d_x = self.dim
        else:
            partial_size = int(self.dim * self.p)
            norm_x = safe_norm(x[..., :partial_size])
            d_x = partial_size
        rms_x = norm_x * d_x ** (-0.5)
        x_normed = x / (rms_x + self.eps)
        out = scale * x_normed
        if self.use_bias:
            offset = self.param("offset", nn.initializers.zeros, (self.dim,))
            out = out + offset
        return out


class MLP(nn.Module):
    """``build_mlp`` of the reference (``layers.py:77-113``): Linear+ReLU
    x(n-1) + Linear + optional RMSNorm output; default 4 linear layers."""

    hidden_size: int
    out_size: int
    nb_of_layers: int = 4
    layer_norm: bool = True
    dtype: Any = None  # compute/activation dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.nb_of_layers >= 2
        x = nn.relu(nn.Dense(self.hidden_size, dtype=self.dtype, name="dense_0")(x))
        for i in range(self.nb_of_layers - 2):
            x = nn.relu(
                nn.Dense(self.hidden_size, dtype=self.dtype, name=f"dense_{i + 1}")(x)
            )
        x = nn.Dense(
            self.out_size, dtype=self.dtype, name=f"dense_{self.nb_of_layers - 1}"
        )(x)
        if self.layer_norm:
            x = RMSNorm(self.out_size, name="norm")(x)
        return x


class GatedMLP(nn.Module):
    """GEGLU (``layers.py:198-233``): ``gelu(W1 x) * (W2 x)``."""

    hidden_size: int
    expansion_factor: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = self.expansion_factor * self.hidden_size
        left = nn.gelu(
            nn.Dense(width, dtype=self.dtype, name="linear1")(x), approximate=False
        )
        right = nn.Dense(width, dtype=self.dtype, name="linear2")(x)
        return left * right


class GatedMLPBlock(nn.Module):
    """``build_gated_mlp`` (``layers.py:236-262``): RMSNorm -> GEGLU -> Linear."""

    hidden_size: int
    out_size: int
    expansion_factor: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = RMSNorm(x.shape[-1], name="norm")(x)
        x = GatedMLP(
            self.hidden_size, self.expansion_factor, dtype=self.dtype, name="gated"
        )(x)
        return nn.Dense(self.out_size, dtype=self.dtype, name="out")(x)


class GMMHead(nn.Module):
    """Full-covariance GMM head (``layers.py:116-154``): per component
    ``1 (logit) + d (mean) + d(d+1)/2 (Cholesky)`` parameters."""

    d: int
    num_components: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        per_component = self.d + (self.d * (self.d + 1)) // 2 + 1
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="pre_proj")(x)
        # final projection in f32: distribution parameters need the range
        return nn.Dense(self.num_components * per_component, name="proj")(
            h.astype(jnp.float32)
        )


class DiagonalGMMHead(nn.Module):
    """Diagonal-covariance GMM head (``layers.py:157-195``): ``2d + 1`` per
    component."""

    d: int
    num_components: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        per_component = 2 * self.d + 1
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="pre_proj")(x)
        return nn.Dense(self.num_components * per_component, name="proj")(
            h.astype(jnp.float32)
        )


class Attention(nn.Module):
    """Multi-head adjacency-masked attention (``layers.py:460-545``).

    Parity notes (deliberately preserved quirks of the reference):
    - q/k/v are reshaped ``(N, head_dim, num_heads)`` — head h reads the
      feature columns ``h, h+H, h+2H, ...`` (``layers.py:531-533``);
    - scores are scaled by ``1/sqrt(k.size(-1))`` where ``k`` is in that
      layout, i.e. ``1/sqrt(num_heads)`` — NOT ``1/sqrt(head_dim)``
      (``layers.py:411-412``). Set ``scale_by_head_dim=True`` for the
      conventional scaling.
    """

    output_dim: int
    num_heads: int = 4
    use_proj_bias: bool = True
    use_separate_proj_weight: bool = True
    scale_by_head_dim: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        senders: jax.Array,
        receivers: jax.Array,
        edge_mask: Optional[jax.Array] = None,
        ell_degree: Optional[int] = None,
        twin_perm: Optional[jax.Array] = None,
        partition_axis: Optional[str] = None,
        halo_send_idx: Optional[jax.Array] = None,
        csr_bounds: Optional[jax.Array] = None,
        csr_max_chunks: Optional[int] = None,
        halo_dtype: Optional[str] = None,
        csr_bounds_halo: Optional[jax.Array] = None,
        num_local_edges: Optional[int] = None,
    ) -> jax.Array:
        assert self.output_dim % self.num_heads == 0
        head_dim = self.output_dim // self.num_heads
        n = x.shape[0]

        q_proj = nn.Dense(
            self.output_dim, use_bias=self.use_proj_bias, dtype=self.dtype,
            name="q_proj",
        )
        if self.use_separate_proj_weight:
            k_proj = nn.Dense(
                self.output_dim, use_bias=self.use_proj_bias, dtype=self.dtype,
                name="k_proj",
            )
            v_proj = nn.Dense(
                self.output_dim, use_bias=self.use_proj_bias, dtype=self.dtype,
                name="v_proj",
            )
            q, k, v = q_proj(x), k_proj(x), v_proj(x)
        else:
            # Reference shares only the q WEIGHT matrix across q/k/v; the
            # biases remain independent parameters (layers.py:497-501 assigns
            # ``.weight`` only). Model that as zero-init additive bias deltas
            # on top of the shared Dense: k = xW + b_q + (b_k - b_q).
            q = q_proj(x)
            if self.use_proj_bias:
                k_bias_delta = self.param(
                    "k_bias_delta", nn.initializers.zeros, (self.output_dim,)
                )
                v_bias_delta = self.param(
                    "v_bias_delta", nn.initializers.zeros, (self.output_dim,)
                )
                k = q + k_bias_delta
                v = q + v_bias_delta
            else:
                k = v = q

        def to_heads(t):
            # (N, head_dim, num_heads) layout, then [N, H, Dh] for the op.
            return t.reshape(n, head_dim, self.num_heads).transpose(0, 2, 1)

        scale = (head_dim if self.scale_by_head_dim else self.num_heads) ** -0.5
        y = sparse_graph_attention(
            to_heads(q),
            to_heads(k),
            to_heads(v),
            senders,
            receivers,
            num_nodes=n,
            edge_mask=edge_mask,
            scale=scale,
            ell_degree=ell_degree,
            twin_perm=twin_perm,
            partition_axis=partition_axis,
            halo_send_idx=halo_send_idx,
            csr_bounds=csr_bounds,
            csr_max_chunks=csr_max_chunks,
            halo_dtype=halo_dtype,
            csr_bounds_halo=csr_bounds_halo,
            num_local_edges=num_local_edges,
        )
        # Back to the reference's flat layout: [N, H, Dh] -> (N, Dh, H) -> [N, D].
        y = y.transpose(0, 2, 1).reshape(n, self.output_dim)
        return nn.Dense(
            self.output_dim, use_bias=self.use_proj_bias, dtype=self.dtype,
            name="proj",
        )(y)


class TransformerBlock(nn.Module):
    """Pre-norm transformer block (``layers.py:548-627``):
    ``x + attn(norm1(x))`` then ``x + gated_mlp(norm2(x))``."""

    output_dim: int
    num_heads: int = 4
    use_proj_bias: bool = True
    use_separate_proj_weight: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        senders: jax.Array,
        receivers: jax.Array,
        edge_mask: Optional[jax.Array] = None,
        ell_degree: Optional[int] = None,
        twin_perm: Optional[jax.Array] = None,
        partition_axis: Optional[str] = None,
        halo_send_idx: Optional[jax.Array] = None,
        csr_bounds: Optional[jax.Array] = None,
        csr_max_chunks: Optional[int] = None,
        halo_dtype: Optional[str] = None,
        csr_bounds_halo: Optional[jax.Array] = None,
        num_local_edges: Optional[int] = None,
    ) -> jax.Array:
        attn = Attention(
            output_dim=self.output_dim,
            num_heads=self.num_heads,
            use_proj_bias=self.use_proj_bias,
            use_separate_proj_weight=self.use_separate_proj_weight,
            dtype=self.dtype,
            name="attention",
        )
        x = x + attn(
            RMSNorm(self.output_dim, name="norm1")(x),
            senders,
            receivers,
            edge_mask,
            ell_degree,
            twin_perm,
            partition_axis,
            halo_send_idx,
            csr_bounds,
            csr_max_chunks,
            halo_dtype,
            csr_bounds_halo,
            num_local_edges,
        ).astype(x.dtype)
        x = x + GatedMLPBlock(
            hidden_size=self.output_dim, out_size=self.output_dim, dtype=self.dtype,
            name="gated_mlp",
        )(RMSNorm(self.output_dim, name="norm2")(x)).astype(x.dtype)
        return x


class SplitDense(nn.Module):
    """A Dense layer over a conceptual concat input, applied as partial
    matmuls of slices of ONE ``[sum(in_sizes), features]`` kernel — so the
    param tree (``{kernel, bias}``) is identical to ``nn.Dense`` on the
    concat. Lets callers reassociate ``Dense(concat([a, b, c]))`` as
    ``a@W_a + b@W_b + c@W_c + bias`` with each partial computed where it is
    cheapest (e.g. at node granularity before an edge gather)."""

    features: int
    in_sizes: Tuple[int, ...]
    dtype: Any = None

    @nn.compact
    def __call__(self, parts, posts=None) -> jax.Array:
        """``posts[i]`` (optional callable) is applied to term ``i`` after its
        matmul — e.g. an edge gather, so the matmul runs on node rows."""
        total = sum(self.in_sizes)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (total, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or kernel.dtype
        posts = posts or (None,) * len(self.in_sizes)
        out = None
        off = 0
        for part, size, post in zip(parts, self.in_sizes, posts):
            w = kernel[off : off + size].astype(dtype)
            term = part.astype(dtype) @ w
            if post is not None:
                term = post(term)
            out = term if out is None else out + term
            off += size
        return out + bias.astype(dtype)


class _FusedEdgeMLP(nn.Module):
    """The reference ``build_mlp`` with its first layer as a ``SplitDense``
    over ``[edge_attr, x_recv, x_send]`` — param tree identical to ``MLP``
    (so checkpoints and the torch importer are unaffected)."""

    hidden_size: int
    in_sizes: Tuple[int, ...]
    nb_of_layers: int = 4
    layer_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, parts, posts) -> jax.Array:
        assert self.nb_of_layers >= 2
        y = SplitDense(
            self.hidden_size, self.in_sizes, dtype=self.dtype, name="dense_0"
        )(parts, posts)
        y = nn.relu(y)
        for i in range(self.nb_of_layers - 2):
            y = nn.relu(
                nn.Dense(self.hidden_size, dtype=self.dtype, name=f"dense_{i + 1}")(y)
            )
        y = nn.Dense(
            self.hidden_size, dtype=self.dtype,
            name=f"dense_{self.nb_of_layers - 1}",
        )(y)
        if self.layer_norm:
            y = RMSNorm(self.hidden_size, name="norm")(y)
        return y


class GraphNetBlock(nn.Module):
    """Message-passing block (``layers.py:630-746``).

    Edge update: MLP on ``[edge_attr, x[receivers], x[senders]]`` (the
    reference's ``[edge_attr, x_i, x_j]`` with i=target=col, j=source=row).
    Node update: MLP on ``[x, sum of incoming edge messages]`` where messages
    aggregate to ``receivers`` (flow="source_to_target"). Residuals on both.

    ``project_before_gather`` (EXPERIMENTAL, default off): the edge MLP's
    first layer is linear, so its x-terms can be projected at NODE granularity
    and gathered afterwards — ``ea@W_e + (x@W_r)[recv] + (x@W_s)[send]`` —
    cutting that matmul's row count from E to N for two of three terms
    (~2.25x fewer FLOPs in this layer at the mesh's E≈6N). Same math, same
    param tree (``SplitDense`` slices the very same ``dense_0`` kernel).
    MEASURED SLOWER (0.65x) on the current chip: XLA fuses the COO gathers
    straight into the one big ``[E,3h]x[3h,h]`` matmul, so splitting it
    materializes two extra ``[E,h]`` HBM intermediates that outweigh the
    FLOP saving (chained-step methodology, 2026-08-18). Kept as the fast
    path for gather-hostile compilers/hardware.

    ``overlap_exchange`` (default ON, partitioned graphs only): in
    edge-partitioned SPMD the sender gather rides a collective (halo
    ``all_to_all`` or ``all_gather``, ``ops.halo``). With the fused concat
    edge MLP, EVERY edge-MLP matmul sits downstream of that collective —
    nothing overlaps. This knob splits ONLY the sender term out of the
    first layer: the sender projection runs at node granularity BEFORE the
    exchange (the collective ships already-projected ``x @ W_s`` rows —
    same bytes), and the ``[E, ea+h] @ [ea+h, h]`` edge_attr+receiver
    partial matmul is independent work XLA's latency-hiding scheduler
    schedules between all_to_all-start and -done. After -done only a
    gather + add remain on the critical path. One extra ``[E,h]``
    intermediate (vs two for the full split above); same param tree.
    """

    hidden_size: int
    nb_of_layers: int = 4
    layer_norm: bool = True
    dtype: Any = None
    project_before_gather: bool = False
    overlap_exchange: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_attr: jax.Array,
        senders: jax.Array,
        receivers: jax.Array,
        edge_mask: Optional[jax.Array] = None,
        ell_degree: Optional[int] = None,
        twin_perm: Optional[jax.Array] = None,
        partition_axis: Optional[str] = None,
        halo_send_idx: Optional[jax.Array] = None,
        halo_dtype: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if partition_axis is not None:
            # Edge-partitioned SPMD: receivers are local; senders index the
            # all-gathered global node table (backward: reduce_scatter) — or,
            # in halo mode, the O(boundary) all_to_all exchange table
            # (shipped 16-bit when halo_dtype="bf16").
            gather_recv = lambda p: take_rows(p, receivers)  # noqa: E731
            gather_send = lambda p: partitioned_gather(  # noqa: E731
                p, senders, partition_axis, halo_send_idx, halo_dtype
            )
        elif ell_degree is not None:
            # ELL fast path: receivers are slot owners -> broadcast; senders
            # gather with twin-permutation backward; no scatters anywhere.
            gather_recv = lambda p: ell_repeat(p, ell_degree)  # noqa: E731
            gather_send = lambda p: ell_gather(  # noqa: E731
                p, senders, twin_perm, ell_degree
            )
        else:
            gather_recv = lambda p: take_rows(p, receivers)  # noqa: E731
            gather_send = lambda p: take_rows(p, senders)  # noqa: E731

        if self.project_before_gather:
            edge_update = _FusedEdgeMLP(
                hidden_size=self.hidden_size,
                in_sizes=(edge_attr.shape[-1], x.shape[-1], x.shape[-1]),
                nb_of_layers=self.nb_of_layers,
                layer_norm=self.layer_norm,
                dtype=self.dtype,
                name="edge_block",
            )((edge_attr, x, x), (None, gather_recv, gather_send))
        elif partition_axis is not None and self.overlap_exchange:
            # Overlap the sender collective with the edge_attr+receiver 2/3
            # of the first layer (see class docstring). Kernel rows
            # [0, ea+h) are the fused local part; rows [ea+h, ea+2h) the
            # sender slice — identical param tree to the concat MLP.
            local = jnp.concatenate([edge_attr, gather_recv(x)], axis=-1)
            edge_update = _FusedEdgeMLP(
                hidden_size=self.hidden_size,
                in_sizes=(edge_attr.shape[-1] + x.shape[-1], x.shape[-1]),
                nb_of_layers=self.nb_of_layers,
                layer_norm=self.layer_norm,
                dtype=self.dtype,
                name="edge_block",
            )((local, x), (None, gather_send))
        else:
            edge_in = jnp.concatenate(
                [edge_attr, gather_recv(x), gather_send(x)], axis=-1
            )
            edge_update = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                nb_of_layers=self.nb_of_layers,
                layer_norm=self.layer_norm,
                dtype=self.dtype,
                name="edge_block",
            )(edge_in)

        if ell_degree is not None:
            aggr = ell_segment_sum(edge_update, ell_degree, edge_mask)
        else:
            aggr = masked_segment_sum(
                edge_update, receivers, num_segments=x.shape[0], mask=edge_mask
            )
        node_in = jnp.concatenate([x, aggr], axis=-1)
        node_update = MLP(
            hidden_size=self.hidden_size,
            out_size=self.hidden_size,
            nb_of_layers=self.nb_of_layers,
            layer_norm=self.layer_norm,
            dtype=self.dtype,
            name="node_block",
        )(node_in)

        return (
            x + node_update.astype(x.dtype),
            edge_attr + edge_update.astype(edge_attr.dtype),
        )
