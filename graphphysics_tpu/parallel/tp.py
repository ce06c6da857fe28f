"""Tensor parallelism over a ``model`` mesh axis (GSPMD / pjit style).

Brand-new design — the reference is strictly single-device
(``graphphysics/train.py:233-236``, SURVEY.md §2.4). Unlike the shard_map
paths (``parallel/dp.py``, ``parallel/graph_partition.py``), which spell out
every collective manually, TP here uses the compiler-driven recipe: annotate
the PARAMETER shardings and let XLA's SPMD partitioner insert the
all-reduces. This is the idiomatic JAX approach for weight parallelism
("pick a mesh, annotate shardings, let XLA insert collectives").

Sharding rule (Megatron-style column→row pairing so each Linear pair needs
one psum, not per-layer all-gathers):

- MLP ``dense_{i}`` kernels: even ``i`` → column-parallel ``P(None, model)``
  (bias sharded), odd ``i`` → row-parallel ``P(model, None)`` (bias
  replicated, added after the implicit psum).
- Attention ``q/k/v_proj`` → column-parallel (per-head split);
  ``proj`` (output) → row-parallel.
- GatedMLP ``linear1``/``linear2`` → column, ``out`` → row.
- Norm scales, normalizer statistics, GMM heads, everything else →
  replicated.

``scan_blocks`` layouts (stacked ``[L, in, out]`` kernels) get the same
specs shifted by the leading layer axis.

TP is worthwhile only for wide-hidden configs (weights ≥ activations); for
the reference's h=32..128 models, data and graph (edge) parallelism are the
production paths — TP exists so the full tp/dp/graph(sp) sharding space
composes.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

def _name_of(entry) -> str:
    return getattr(entry, "key", getattr(entry, "name", str(entry)))


def _spec_for(path, leaf, axis: str) -> P:
    names = [_name_of(e) for e in path]
    if not names or leaf.ndim == 0:
        return P()
    kind = names[-1]
    owner = names[-2] if len(names) >= 2 else ""
    context = names[:-2]
    # stacked scan_blocks params carry a leading [L] layer axis
    lead = (None,) if leaf.ndim == 3 and kind == "kernel" else ()
    # Match by owning-module context, not bare layer names: GMMHead also
    # names its final Dense "proj" but must stay replicated (docstring).
    m = re.fullmatch(r"dense_(\d+)", owner)
    in_attention = "attention" in context
    in_gated = context and context[-1] == "gated"
    in_gated_mlp = "gated_mlp" in context
    column = (
        (m is not None and int(m.group(1)) % 2 == 0)
        or (in_attention and owner in ("q_proj", "k_proj", "v_proj"))
        or (in_gated and owner in ("linear1", "linear2"))
    )
    row = (
        (m is not None and int(m.group(1)) % 2 == 1)
        or (in_attention and owner == "proj")
        or (in_gated_mlp and not in_gated and owner == "out")
    )
    if kind == "kernel" and leaf.ndim >= 2:
        if column:
            return P(*lead, None, axis)
        if row:
            # no trailing None: with_sharding_constraint normalizes it away,
            # and P('model', None) != P('model') breaks the jit cache
            return P(*lead, axis)
    if kind == "bias" and column:
        return P(*((None,) * (leaf.ndim - 1)), axis)
    return P()


def tp_param_specs(params, axis: str = MODEL_AXIS):
    """PartitionSpec pytree for a Simulator/processor param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _spec_for(p, x, axis), params
    )


def shard_tp_state(state, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a train-state pytree onto the mesh: params (and the
    param-shaped optimizer moments) sharded by :func:`tp_param_specs`,
    everything else replicated."""
    return shard_state_by_param_specs(
        state, mesh, tp_param_specs(state["params"], axis)
    )


def opt_state_specs(opt_state, params, specs):
    """PartitionSpec pytree for an optimizer state: the moments mirror the
    param tree (adamw mu/nu, sgd trace carry the param path as a suffix), so
    each opt leaf takes the spec of the param whose path it ends with and
    whose shape it matches; everything else (counts, empty states) is
    replicated."""
    params_flat = {
        tuple(_name_of(e) for e in p): (s, l.shape)
        for (p, s), (_, l) in zip(
            jax.tree_util.tree_flatten_with_path(specs)[0],
            jax.tree_util.tree_flatten_with_path(params)[0],
        )
    }

    def opt_spec(path, leaf):
        names = tuple(_name_of(e) for e in path)
        for k, (s, shape) in params_flat.items():
            if (
                len(names) >= len(k)
                and names[-len(k):] == k
                and leaf.shape == shape
            ):
                return s
        return P()

    return jax.tree_util.tree_map_with_path(opt_spec, opt_state)


def shard_state_by_param_specs(state, mesh: Mesh, specs):
    """Place a train-state pytree onto ``mesh``: params by the given spec
    tree, optimizer moments by their matching param's spec (adamw/sgd
    moments carry the param path as a suffix), everything else replicated.
    Shared by the TP and PP state placement helpers."""

    def put(tree, spec_tree):
        return jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            tree,
            spec_tree,
        )

    def put_replicated(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree
        )

    out = dict(state)
    out["params"] = put(state["params"], specs)
    out["opt_state"] = put(
        state["opt_state"],
        opt_state_specs(state["opt_state"], state["params"], specs),
    )
    if "normalizer" in state:
        out["normalizer"] = put_replicated(state["normalizer"])
    if "step" in state:
        out["step"] = jax.device_put(
            state["step"], NamedSharding(mesh, P())
        )
    return out


def make_tp_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    loss_kind: str = "l2",
    gmm_kwargs: dict | None = None,
) -> Callable:
    """Jitted TP train step ``step(state, graph)``: graph replicated, params
    sharded per :func:`tp_param_specs` (shard the state first with
    :func:`shard_tp_state`). XLA's SPMD partitioner inserts the collectives;
    sharding constraints on the updated params keep the layout stable across
    steps. Loss semantics identical to the single-device step
    (``training/trainer.py::_build_train_step``)."""
    from graphphysics_tpu.parallel.dp import _make_local_loss

    nti = sim.config.node_type_index
    local_loss = _make_local_loss(masks, loss_kind, gmm_kwargs)

    def constrain(tree, specs):
        return jax.tree_util.tree_map(
            lambda a, s: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, s)
            ),
            tree,
            specs,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, graph):
        specs = tp_param_specs(state["params"], axis)
        opt_specs = opt_state_specs(state["opt_state"], state["params"], specs)

        def loss_fn(p):
            (out, target_dn, _), mutated = sim.apply(
                {"params": p, "normalizer": state["normalizer"]},
                graph,
                is_training=True,
                mutable=["normalizer"],
            )
            node_type = graph.x[:, nti].astype(jnp.int32)
            loss_sum, count = local_loss(
                target_dn, out, node_type, graph.node_mask, graph.exclude_mask
            )
            return loss_sum / jnp.maximum(count, 1.0), mutated["normalizer"]

        (loss, new_norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        # constrain BOTH params and moments so the output layout equals the
        # input layout exactly — otherwise step 2 misses the jit cache and
        # recompiles (20-60s on the real chip)
        new_params = constrain(new_params, specs)
        new_opt = constrain(new_opt, opt_specs)
        return {
            "params": new_params,
            "normalizer": new_norm,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, loss

    return step
