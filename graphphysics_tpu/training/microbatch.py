"""Gradient accumulation: one optimizer step over M sequential microbatches.

The reference has no analog (it trains one batch per step on one GPU,
``graphphysics/train.py:233-236``); this exists for the TPU regime where a
single giant mesh (or a large effective batch) does not fit in HBM alongside
activations: ``lax.scan`` over the microbatch axis keeps only ONE
microbatch's activations live at a time while the gradient accumulator rides
the carry.

Exactness contract (tested in ``tests/test_microbatch.py``): the step on a
stacked ``[M, ...]`` batch equals the plain single step on the concat of the
M microbatches, bit-for-bit up to fp reduction order —

- gradients / loss: per-microbatch masked SUMS and COUNTS accumulate and the
  final masked mean divides once (``losses.make_local_loss``), so node-count
  imbalance between microbatches cannot bias the mean;
- normalizer statistics: all M microbatches' row sums fold in FIRST (they are
  linear), the accumulation *call* counter advances once per optimizer step,
  and the forward/backward then normalizes every microbatch with the merged
  global-batch statistics — the same two-phase scheme as the data-parallel
  step (``parallel/dp.py``), with a scan instead of a psum.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.core.normalizer import MAX_ACCUMULATIONS, NormalizerState
from graphphysics_tpu.training import losses as losses_mod

_is_state = lambda x: isinstance(x, NormalizerState)


def _open_counter(norm):
    """Pre-scan: zero the accumulation-call counter of every normalizer that
    is still live so all M microbatches fold in (the live check inside
    ``normalizer.accumulate`` would otherwise see the counter advance M
    times); capped normalizers stay capped."""

    def f(s: NormalizerState) -> NormalizerState:
        capped = s.num_accumulations >= MAX_ACCUMULATIONS
        return dataclasses.replace(
            s,
            num_accumulations=jnp.where(capped, s.num_accumulations, 0.0),
        )

    return jax.tree_util.tree_map(f, norm, is_leaf=_is_state)


def _close_counter(old, new):
    """Post-scan: restore the call counter to old+1 (one optimizer step =
    one accumulation call, matching the single-step and DP semantics)."""

    def f(o: NormalizerState, n: NormalizerState) -> NormalizerState:
        capped = o.num_accumulations >= MAX_ACCUMULATIONS
        return dataclasses.replace(
            n,
            num_accumulations=jnp.where(
                capped, o.num_accumulations, o.num_accumulations + 1.0
            ),
        )

    return jax.tree_util.tree_map(f, old, new, is_leaf=_is_state)


def make_microbatch_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    loss_kind: str = "l2",
    gmm_kwargs: dict | None = None,
) -> Callable:
    """Build the jitted gradient-accumulation step: ``step(state, stacked)``
    where the stacked Graph's leaves are ``[M, ...]`` (M microbatches, e.g.
    from ``GraphLoader(collate="stack")``); returns the same
    ``(new_state, loss)`` as the plain train step on the concat batch."""
    from graphphysics_tpu.models.simulator import Simulator

    nti = sim.config.node_type_index
    local_loss = losses_mod.make_local_loss(masks, loss_kind, gmm_kwargs)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, stacked: Graph):
        params = state["params"]

        # Phase 1: fold every microbatch's statistics into the normalizers
        # (linear sums), one accumulation call for the whole step.
        def acc_one(norm, graph: Graph):
            _, mutated = sim.apply(
                {"params": params, "normalizer": norm},
                graph,
                method=Simulator.accumulate_stats,
                mutable=["normalizer"],
            )
            return mutated["normalizer"], None

        scanned, _ = jax.lax.scan(
            acc_one, _open_counter(state["normalizer"]), stacked
        )
        merged_norm = _close_counter(state["normalizer"], scanned)

        # Phase 2: accumulate masked loss SUMS, COUNTS and gradients of the
        # sums over the microbatches; normalize the mean once at the end.
        def loss_sum_fn(p, graph: Graph):
            out, target_dn, _ = sim.apply(
                {"params": p, "normalizer": merged_norm},
                graph,
                is_training=True,
                accumulate_stats=False,
            )
            node_type = graph.x[:, nti].astype(jnp.int32)
            return local_loss(
                target_dn, out, node_type, graph.node_mask, graph.exclude_mask
            )

        def grad_one(carry, graph: Graph):
            g_acc, ls_acc, c_acc = carry
            (ls, c), g = jax.value_and_grad(loss_sum_fn, has_aux=True)(
                params, graph
            )
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            return (g_acc, ls_acc + ls, c_acc + c), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (grads, loss_sum, count), _ = jax.lax.scan(
            grad_one, (zero_grads, jnp.zeros(()), jnp.zeros(())), stacked
        )
        denom = jnp.maximum(count, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        loss = loss_sum / denom

        updates, new_opt = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        return {
            "params": new_params,
            "normalizer": merged_norm,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, loss

    return step
