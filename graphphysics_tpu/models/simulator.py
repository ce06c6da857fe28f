"""Simulator: feature assembly, normalization, delta targets, denormalizing decode.

TPU-native re-design of the reference ``graphphysics/models/simulator.py:128-405``.
The three running normalizers (node / edge / output-delta) live in a flax
variable collection ``"normalizer"`` so the train step stays purely functional:

    (out, aux), mutated = simulator.apply(vars, graph, is_training=True,
                                          mutable=["normalizer"])

Batching convention: graphs are batched by *concatenation with index offsets*
(see ``core.graph.concat_graphs``) — the static-shape analog of jraph/PyG
batching — so the simulator and processors always see a single flat graph and
every segment op runs once over the whole batch (no vmap, no per-sample
launch). Padding rows are excluded from the running statistics via
``graph.node_mask`` / ``graph.edge_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphphysics_tpu.core import normalizer as norm
from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.gmm import sample_gmm, sample_gmm_diagonal


class Normalizer(nn.Module):
    """Online-statistics normalizer as a flax module over the functional core
    (``core.normalizer``); mirrors reference ``layers.py:265-392``."""

    size: int

    def setup(self):
        self.state = self.variable("normalizer", "state", norm.init, self.size)

    def __call__(
        self,
        data: jax.Array,
        accumulate: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        state = self.state.value
        # No accumulation during flax init: init traces the forward with all
        # collections mutable, which would silently pre-accumulate one batch.
        if (
            accumulate
            and self.is_mutable_collection("normalizer")
            and not self.is_initializing()
        ):
            state = norm.accumulate(state, data, mask)
            self.state.value = state
        return (data - norm.mean(state)) / norm.std_with_epsilon(state)

    def inverse(self, normalized: jax.Array) -> jax.Array:
        return norm.inverse(self.state.value, normalized)


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    """Index layout of the raw node-feature matrix (reference
    ``simulator.py:134-178`` constructor arguments + config ``index`` block)."""

    node_input_size: int  # features fed to the model, INCLUDING NodeType.SIZE one-hot
    edge_input_size: int  # 0 -> no edge features / normalizer (transformer path)
    output_size: int
    feature_index_start: int
    feature_index_end: int
    output_index_start: int
    output_index_end: int
    node_type_index: int


class Simulator(nn.Module):
    """Wraps a processor model with normalization and delta-target handling.

    ``__call__`` mirrors reference ``Simulator.forward`` (``simulator.py:309-347``):

    - training: returns ``(network_output, target_delta_normalized, None)``
    - eval (K == 0): additionally returns denormalized ``outputs`` =
      ``pre_target + output_normalizer.inverse(network_output)``
    - eval (K > 0): samples the GMM head first (rng collection ``"sample"``).
    """

    config: SimulatorConfig
    model: nn.Module

    def setup(self):
        cfg = self.config
        self._output_normalizer = Normalizer(cfg.output_size, name="output_normalizer")
        self._node_normalizer = Normalizer(cfg.node_input_size, name="node_normalizer")
        if cfg.edge_input_size > 0:
            self._edge_normalizer = Normalizer(
                cfg.edge_input_size, name="edge_normalizer"
            )
        else:
            self._edge_normalizer = None

    def _pre_target(self, graph: Graph) -> jax.Array:
        cfg = self.config
        return graph.x[:, cfg.output_index_start : cfg.output_index_end]

    def node_type(self, graph: Graph) -> jax.Array:
        return graph.x[:, self.config.node_type_index].astype(jnp.int32)

    def _build_node_features(self, graph: Graph) -> jax.Array:
        cfg = self.config
        features = graph.x[:, cfg.feature_index_start : cfg.feature_index_end]
        one_hot = jax.nn.one_hot(
            self.node_type(graph), NodeType.SIZE, dtype=features.dtype
        )
        return jnp.concatenate([features, one_hot], axis=1)

    def accumulate_stats(self, graph: Graph) -> jax.Array:
        """Fold one batch into the three normalizers WITHOUT running the model.

        Used by the data-parallel step: each shard accumulates its local
        slice, the deltas are psum-merged, and the forward then normalizes
        with the merged (global-batch) statistics — reproducing single-device
        normalization exactly (the sums are linear in the data).
        """
        pre_target = self._pre_target(graph)
        self._output_normalizer(
            graph.y - pre_target, accumulate=True, mask=graph.node_mask
        )
        self._node_normalizer(
            self._build_node_features(graph), accumulate=True, mask=graph.node_mask
        )
        if self._edge_normalizer is not None and graph.edge_attr is not None:
            self._edge_normalizer(
                graph.edge_attr, accumulate=True, mask=graph.edge_mask
            )
        return jnp.zeros(())

    def __call__(
        self,
        graph: Graph,
        is_training: bool = True,
        accumulate_stats: Optional[bool] = None,
    ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        cfg = self.config
        if accumulate_stats is None:
            accumulate_stats = is_training

        # Normalized delta target (reference simulator.py:206-224).
        pre_target = self._pre_target(graph)
        target_delta = graph.y - pre_target
        target_delta_normalized = self._output_normalizer(
            target_delta, accumulate=accumulate_stats, mask=graph.node_mask
        )

        node_features = self._build_node_features(graph)
        node_features_normalized = self._node_normalizer(
            node_features, accumulate=accumulate_stats, mask=graph.node_mask
        )
        edge_attr = graph.edge_attr
        if self._edge_normalizer is not None and edge_attr is not None:
            edge_attr = self._edge_normalizer(
                edge_attr, accumulate=accumulate_stats, mask=graph.edge_mask
            )

        model_graph = graph.replace(x=node_features_normalized, edge_attr=edge_attr)
        network_output = self.model(model_graph)

        if is_training:
            return network_output, target_delta_normalized, None

        if self.model.K == 0:
            update = self._output_normalizer.inverse(network_output)
        else:
            # temperature 0.0 is a valid setting (deterministic means,
            # reference simulator.py:342) — only None defaults to 1.0
            temp = self.model.temperature
            temp = 1.0 if temp is None else temp
            sampler = (
                sample_gmm_diagonal
                if getattr(self.model, "use_diagonal", True)
                else sample_gmm
            )
            sampled = sampler(
                self.make_rng("sample"),
                network_output,
                d=self.model.d,
                K=self.model.K,
                temperature=temp,
            )
            update = self._output_normalizer.inverse(sampled)
        outputs = pre_target + update
        return network_output, target_delta_normalized, outputs
