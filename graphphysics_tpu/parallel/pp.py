"""Pipeline parallelism over the message-passing depth (GPipe on a ring).

Brand-new design — the reference is strictly single-device (SURVEY.md §2.4).
The EPD processor's blocks are homogeneous, so with the ``scan_blocks``
parameter layout (stacked ``[L, ...]`` kernels, ``models/processors.py``)
pipeline stages fall out naturally: shard the layer axis over a ``pipe``
mesh axis (device ``s`` holds layers ``[s*K, (s+1)*K)``), rotate the
node/edge activations around the ring with ``lax.ppermute``, and schedule
``M`` microbatches GPipe-style over ``M + S - 1`` ticks. Autodiff through
``ppermute`` (its transpose is the reverse permutation) yields the GPipe
backward schedule for free.

Work split per device:

- replicated (cheap, O(1/L) of the FLOPs): normalizer accumulation +
  normalization, node/edge encoders, decoder, loss — every stage computes
  them identically, so encoder/decoder/normalizer state stay consistent by
  psum-ing their grads over the pipe axis;
- pipelined (the hot 15-block stack): each tick runs the device's K local
  blocks on the microbatch currently at its stage, then ships the
  ``[N, h]`` node and ``[E, h]`` edge tables to the next stage.

PP ships whole activation tables per stage boundary, so for mesh GNNs it is
dominated by data and graph (edge) parallelism (``parallel/dp.py``,
``parallel/graph_partition.py``) — it exists to complete the
data x graph x model x pipe sharding space and is exact-parity tested
against the single-device step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphphysics_tpu.core import normalizer as norm
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.parallel.dp import _make_local_loss
from graphphysics_tpu.parallel.tp import shard_state_by_param_specs

PIPE_AXIS = "pipe"


def _is_block_path(path) -> bool:
    names = [getattr(e, "key", getattr(e, "name", str(e))) for e in path]
    return "blocks" in names


def pp_param_specs(params, axis: str = PIPE_AXIS):
    """Shard the stacked ``[L, ...]`` block params on their layer axis;
    replicate encoders/decoder/everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: P(axis) if _is_block_path(p) else P(), params
    )


def shard_pp_state(state, mesh: Mesh, axis: str = PIPE_AXIS):
    """Place a train-state pytree onto the pipe mesh: block params (and
    their optimizer moments) sharded on the layer axis, rest replicated."""
    return shard_state_by_param_specs(
        state, mesh, pp_param_specs(state["params"], axis)
    )


def make_pp_train_step(
    sim,
    tx: optax.GradientTransformation,
    masks: Sequence[int],
    mesh: Mesh,
    axis: str = PIPE_AXIS,
) -> Callable:
    """Build the jitted GPipe train step ``step(state, microbatches)``.

    ``sim.model`` must be an ``EncodeProcessDecode`` or
    ``EncodeTransformDecode`` with ``scan_blocks=True`` and with
    ``message_passing_num`` divisible by the pipe-axis size; the decoder may
    be the plain MLP or a GMM head (diagonal or full-covariance, trained
    with the matching NLL like the single-device step); ``microbatches`` is
    a stacked
    Graph pytree (leaves ``[M, ...]``, ``core.graph.stack_graphs``) resident
    replicated. Semantics identical to the single-device step on the
    concatenation of the M microbatches (masked global mean loss, one
    normalizer accumulation of all rows)."""
    from graphphysics_tpu.models.layers import MLP, GraphNetBlock, TransformerBlock
    from graphphysics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
        _decoder,
    )

    model = sim.model
    is_transformer = isinstance(model, EncodeTransformDecode)
    if not isinstance(model, (EncodeProcessDecode, EncodeTransformDecode)):
        raise NotImplementedError("pipeline parallelism supports EPD/transformer")
    if not model.scan_blocks:
        raise ValueError(
            "make_pp_train_step needs scan_blocks=True (stacked [L] block "
            "params — the layer axis is the pipe shard axis)"
        )
    if model.only_processor:
        raise NotImplementedError("pp: only_processor models not supported")
    if model.remat:
        # the pre/post-pipe below rebuilds the forward from submodules, so
        # the model's remat flag would be silently dropped — refuse instead
        raise NotImplementedError(
            "pp: remat not supported (the GPipe scan already bounds live "
            "activations to one microbatch per stage)"
        )

    S = mesh.shape[axis]
    L = model.message_passing_num
    if L % S != 0:
        raise ValueError(f"message_passing_num {L} not divisible by pipe size {S}")

    cfg = sim.config
    if not is_transformer and cfg.edge_input_size <= 0:
        raise ValueError("pp: EPD requires edge features (edge_input_size > 0)")
    h = model.hidden_size
    dtype = model.dtype
    K = model.num_mixture_components
    if K == 0:
        local_loss = _make_local_loss(masks, "l2", None)
    else:
        t = model.temperature
        local_loss = _make_local_loss(
            masks,
            "diag_gmm" if model.use_diagonal else "full_gmm",
            dict(d=cfg.output_size, K=K, temperature=1.0 if t is None else t),
        )
    node_enc = MLP(h, h, dtype=dtype)
    edge_enc = None if is_transformer else MLP(h, h, dtype=dtype)
    decoder = _decoder(
        h, cfg.output_size, K, model.use_diagonal, dtype, name="decode_module"
    )
    if is_transformer:
        block = TransformerBlock(
            output_dim=h,
            num_heads=model.num_heads,
            use_proj_bias=model.use_proj_bias,
            use_separate_proj_weight=model.use_separate_proj_weight,
            dtype=dtype,
        )
    else:
        block = GraphNetBlock(hidden_size=h, dtype=dtype)

    def per_shard(params, normalizer, opt_state, mbs):
        stage = lax.axis_index(axis)
        M = mbs.x.shape[0]

        def loss_fn(p):
            # --- replicated pre-pipe: stats, normalization, encoders -----
            x_all = mbs.x
            pre_target = x_all[..., cfg.output_index_start : cfg.output_index_end]
            target_delta = mbs.y - pre_target
            nmask = mbs.node_mask

            ostate = norm.accumulate(
                normalizer["output_normalizer"]["state"], target_delta, nmask
            )
            tdn = (target_delta - norm.mean(ostate)) / norm.std_with_epsilon(
                ostate
            )

            node_type = x_all[..., cfg.node_type_index].astype(jnp.int32)
            feats = jnp.concatenate(
                [
                    x_all[..., cfg.feature_index_start : cfg.feature_index_end],
                    jax.nn.one_hot(node_type, NodeType.SIZE, dtype=x_all.dtype),
                ],
                axis=-1,
            )
            nstate = norm.accumulate(
                normalizer["node_normalizer"]["state"], feats, nmask
            )
            feats_n = (feats - norm.mean(nstate)) / norm.std_with_epsilon(nstate)

            estate = None
            ea_n = mbs.edge_attr
            if edge_enc is not None:  # EPD only; checked > 0 at build
                estate = norm.accumulate(
                    normalizer["edge_normalizer"]["state"], ea_n, mbs.edge_mask
                )
                ea_n = (ea_n - norm.mean(estate)) / norm.std_with_epsilon(estate)

            enc_x = node_enc.apply(
                {"params": p["model"]["nodes_encoder"]}, feats_n
            )  # [M, N, h]
            enc_e = None
            if edge_enc is not None:
                enc_e = edge_enc.apply(
                    {"params": p["model"]["edges_encoder"]}, ea_n
                )  # [M, E, h]

            # --- the pipe: rotate the node table (and, for EPD, the edge
            # table) around the ring ----------------------------------------
            block_params = p["model"]["blocks"]["block"]  # leaves [K=L/S, ...]

            def run_stage(x, ea, senders, receivers, emask):
                if is_transformer:
                    def body(x, bp):
                        x = block.apply(
                            {"params": bp}, x, senders, receivers, emask,
                            None, None, None, None, None, None,
                        )
                        return x, None

                    x, _ = lax.scan(body, x, block_params)
                    return x, ea

                def body(carry, bp):
                    x, ea = carry
                    x, ea = block.apply(
                        {"params": bp}, x, ea, senders, receivers, emask,
                        None, None, None, None,
                    )
                    return (x, ea), None

                (x, ea), _ = lax.scan(body, (x, ea), block_params)
                return x, ea

            outputs0 = jnp.zeros_like(enc_x)  # [M, N, h]
            ea0_zero = (
                jnp.zeros((), enc_x.dtype)
                if enc_e is None
                else jnp.zeros_like(enc_e[0])
            )
            carry0 = (jnp.zeros_like(enc_x[0]), ea0_zero, outputs0)
            perm = [(i, (i + 1) % S) for i in range(S)]

            def tick(carry, t):
                x_c, ea_c, outs = carry
                mb_here = t - stage  # microbatch currently at this stage
                idx = jnp.clip(mb_here, 0, M - 1)
                first = stage == 0
                x0 = jnp.where(first, enc_x[idx], x_c)
                ea0 = ea_c if enc_e is None else jnp.where(first, enc_e[idx], ea_c)
                x1, ea1 = run_stage(
                    x0, ea0, mbs.senders[idx], mbs.receivers[idx],
                    mbs.edge_mask[idx],
                )
                emit = (mb_here >= 0) & (mb_here < M) & (stage == S - 1)
                outs = jnp.where(emit, outs.at[idx].set(x1), outs)
                x_c = lax.ppermute(x1, axis, perm)
                ea_c = ea1 if enc_e is None else lax.ppermute(ea1, axis, perm)
                return (x_c, ea_c, outs), None

            (_, _, outs), _ = lax.scan(
                tick, carry0, jnp.arange(M + S - 1, dtype=jnp.int32)
            )

            # --- replicated post-pipe: decode + masked global-mean loss --
            out = decoder.apply(
                {"params": p["model"]["decode_module"]}, outs
            ).astype(jnp.float32)

            flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
            loss_sum, count = local_loss(
                flat(tdn), flat(out), flat(node_type), flat(nmask),
                flat(mbs.exclude_mask) if mbs.exclude_mask is not None else None,
            )
            # Only the last stage's `outs` are real, and the loss must stay
            # LOCAL inside the differentiated function: with check_vma=False
            # the transpose of psum is psum, so a psum here would multiply
            # every gradient by the stage count. `count` carries no gradient
            # (mask-derived), so psum-ing it for the global masked mean is
            # safe; the loss value itself is psum-ed after the grad.
            is_last = (stage == S - 1).astype(loss_sum.dtype)
            gcount = lax.psum(count * is_last, axis)
            loss = loss_sum * is_last / jnp.maximum(gcount, 1.0)
            return loss, (ostate, nstate, estate)

        (loss, states), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        loss = lax.psum(loss, axis)  # nonzero only on the last stage
        # block grads are stage-local and already complete (they flow back
        # through the ppermute chain); encoder/decoder/norm grads live only
        # on the stages that used them — psum keeps replicas consistent.
        grads = jax.tree_util.tree_map_with_path(
            lambda pth, g: g if _is_block_path(pth) else lax.psum(g, axis),
            grads,
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        ostate, nstate, estate = states
        new_norm = dict(normalizer)
        new_norm["output_normalizer"] = {"state": ostate}
        new_norm["node_normalizer"] = {"state": nstate}
        if estate is not None:
            new_norm["edge_normalizer"] = {"state": estate}
        return new_params, new_norm, new_opt, loss

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, mbs):
        # static fields — checked at trace time: the pipe runs blocks with
        # partition_axis=None, so partitioned/halo/ELL senders (global or
        # exchange-table ids) would gather out of range and clamp silently
        if (
            mbs.partition_axis is not None
            or mbs.halo_send_idx is not None
            or mbs.ell_degree is not None
        ):
            raise ValueError(
                "pp: microbatches must be plain unpartitioned COO graphs "
                "(got partition_axis/halo_send_idx/ell_degree set)"
            )
        param_specs = pp_param_specs(state["params"], axis)
        opt_specs = jax.tree_util.tree_map_with_path(
            lambda pth, g: P(axis) if _is_block_path(pth) else P(),
            state["opt_state"],
        )
        batch_specs = jax.tree_util.tree_map(lambda _: P(), mbs)
        norm_specs = jax.tree_util.tree_map(lambda _: P(), state["normalizer"])
        sharded = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(param_specs, norm_specs, opt_specs, batch_specs),
            out_specs=(param_specs, norm_specs, opt_specs, P()),
            check_vma=False,
        )
        new_params, new_norm, new_opt, loss = sharded(
            state["params"], state["normalizer"], state["opt_state"], mbs
        )
        return {
            "params": new_params,
            "normalizer": new_norm,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, loss

    return step
