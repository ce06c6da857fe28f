"""Split-edge halo layout (`partition_graph_halo_np(split_local=True)`):
partitioned transformer attention computes the local-edge partial softmax
INDEPENDENTLY of the halo all_to_all and merges online-softmax stats
(`ops.attention._overlapped_partitioned_attention`). These tests pin

- layout structure (edges preserved, slices correctly split/remapped),
- exact forward/train-step parity with the unsplit halo path and with the
  unpartitioned single-device reference (the merge is exact, so tolerances
  are fp-reassociation-level),
- the pair-kernel (`csr_softmax_spmm_pair`) against the single fused kernel
  on the concatenated edge list, forward AND backward,
- the DEPENDENCE claim itself, at jaxpr level: in split mode the local
  edge-sized compute is NOT downstream of the all_to_all (so a latency-
  hiding scheduler may overlap them), while in the unsplit layout every
  edge gather IS.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.experimental.pallas import tpu as pltpu

from graphphysics_tpu.core.graph import pad_graph_np
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import EncodeTransformDecode
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.parallel import make_mesh, shard_batch
from graphphysics_tpu.parallel.dp import (
    graph_parallel_forward,
    make_graph_parallel_train_step,
)
from graphphysics_tpu.parallel.graph_partition import (
    partition_graph_halo_np,
    unpartition_rows,
)
from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
from graphphysics_tpu.topology.build import to_undirected


def _mesh_graph(n=256, seed=0):
    r = np.random.default_rng(seed)
    s = r.integers(0, n, 3 * n).astype(np.int32)
    t = (s + r.integers(1, 16, 3 * n)).astype(np.int32) % n
    S, R = to_undirected(s, t)
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = r.integers(0, 7, n)
    pos = r.normal(size=(n, 2)).astype(np.float32)
    ea = r.normal(size=(len(S), 3)).astype(np.float32)
    y = r.normal(size=(n, 2)).astype(np.float32)
    return pad_graph_np(x, pos, S, R, n_pad=n, e_pad=len(S) + 32,
                        edge_attr=ea, y=y, node_type_index=2)


def _jnp(g):
    return jax.tree_util.tree_map(jnp.asarray, g)


def test_split_partition_structure():
    g = _mesh_graph()
    n = g.num_nodes
    nl = n // 4
    parts = partition_graph_halo_np(g, 4, split_local=True)
    el = parts.num_local_edges
    assert el is not None and parts.senders.shape[1] > el
    # every edge preserved exactly once, local slice senders strictly local,
    # halo slice senders strictly in the exchange-table halo region
    got = set()
    b = parts.halo_send_idx.shape[2]
    for p in range(4):
        m = parts.edge_mask[p]
        s, r = parts.senders[p], parts.receivers[p]
        loc = m[:el]
        hal = m[el:]
        assert (s[:el][loc] < nl).all()
        sh = s[el:][hal]
        assert ((sh >= nl) & (sh < nl + 4 * b)).all()
        for i in np.flatnonzero(m[:el]):
            got.add((int(s[i]) + p * nl, int(r[i]) + p * nl))
        for i in np.flatnonzero(m[el:]):
            q, slot = divmod(int(s[el + i]) - nl, b)
            sender_global = int(parts.halo_send_idx[q, p, slot]) + q * nl
            got.add((sender_global, int(r[el + i]) + p * nl))
    em = np.asarray(g.edge_mask)
    expected = set(
        zip(np.asarray(g.senders)[em].tolist(),
            np.asarray(g.receivers)[em].tolist())
    )
    assert got == expected


def test_split_forward_matches_single_device_and_unsplit():
    g = _mesh_graph(seed=1)
    gj = _jnp(g)
    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4,
    )
    params = model.init(jax.random.key(0), gj)
    ref = model.apply(params, gj)

    mesh = make_mesh(4, (GRAPH_AXIS,))
    unsplit = shard_batch(
        _jnp(partition_graph_halo_np(g, 4)), mesh, GRAPH_AXIS
    )
    split = shard_batch(
        _jnp(partition_graph_halo_np(g, 4, split_local=True)),
        mesh, GRAPH_AXIS,
    )
    out_u = unpartition_rows(
        np.asarray(graph_parallel_forward(model, params, unsplit, mesh))
    )
    out_s = unpartition_rows(
        np.asarray(graph_parallel_forward(model, params, split, mesh))
    )
    np.testing.assert_allclose(out_s, np.asarray(ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out_s, out_u, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("csr", [False, True])
def test_split_train_step_matches_unsplit(csr):
    g = _mesh_graph(seed=2)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=0, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=cfg.node_input_size,
        output_size=2, hidden_size=16, num_heads=4,
    )
    sim = Simulator(config=cfg, model=model)
    gj = _jnp(g)
    variables = sim.init({"params": jax.random.key(0)}, gj)
    tx = optax.adamw(1e-3)

    def fresh_state():
        return {
            "params": jax.tree_util.tree_map(jnp.array, variables["params"]),
            "normalizer": jax.tree_util.tree_map(
                jnp.array, variables["normalizer"]
            ),
            "opt_state": tx.init(
                jax.tree_util.tree_map(jnp.array, variables["params"])
            ),
            "step": jnp.zeros((), jnp.int32),
        }

    mesh = make_mesh(4, (GRAPH_AXIS,))
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    unsplit = shard_batch(
        _jnp(partition_graph_halo_np(g, 4, csr=csr)), mesh, GRAPH_AXIS
    )
    split = shard_batch(
        _jnp(partition_graph_halo_np(g, 4, csr=csr, split_local=True)),
        mesh, GRAPH_AXIS,
    )
    import contextlib

    ctx = (
        pltpu.force_tpu_interpret_mode()
        if csr and jax.devices()[0].platform != "tpu"
        else contextlib.nullcontext()
    )
    with ctx:
        su, loss_u = step(fresh_state(), unsplit)
        ss, loss_s = step(fresh_state(), split)
        jax.block_until_ready((loss_u, loss_s))
        # compare the UPDATED params too: grads flowed through the merge
        pu = jax.tree_util.tree_leaves(su["params"])
        ps = jax.tree_util.tree_leaves(ss["params"])
        for a, b in zip(pu, ps):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
            )
    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-5)


def test_pair_kernel_matches_single_fwd_and_grad():
    from graphphysics_tpu.ops.pallas_attention import (
        compute_block_bounds,
        csr_softmax_spmm,
        csr_softmax_spmm_pair,
    )

    r = np.random.default_rng(0)
    n, h, dh = 128, 4, 8
    d = h * dh
    ea, eb = 300, 90
    seg_a = np.sort(r.integers(0, n, ea)).astype(np.int32)
    seg_b = np.sort(r.integers(0, n, eb)).astype(np.int32)
    sc_a = r.normal(size=(ea, h)).astype(np.float32)
    sc_b = r.normal(size=(eb, h)).astype(np.float32)
    va = r.normal(size=(ea, d)).astype(np.float32)
    vb = r.normal(size=(eb, d)).astype(np.float32)
    ba = jnp.asarray(compute_block_bounds(seg_a, n, num_real_edges=ea))
    bb = jnp.asarray(compute_block_bounds(seg_b, n, num_real_edges=eb))

    # reference: ONE kernel over the union, re-sorted by segment
    seg_u = np.concatenate([seg_a, seg_b])
    order = np.argsort(seg_u, kind="stable")
    seg_s = seg_u[order]
    sc_s = np.concatenate([sc_a, sc_b])[order]
    v_s = np.concatenate([va, vb])[order]
    bu = jnp.asarray(compute_block_bounds(seg_s, n, num_real_edges=ea + eb))

    with pltpu.force_tpu_interpret_mode():
        ref = csr_softmax_spmm(
            jnp.asarray(sc_s), jnp.asarray(v_s), jnp.asarray(seg_s), bu, n
        )
        out = csr_softmax_spmm_pair(
            jnp.asarray(sc_a), jnp.asarray(va), jnp.asarray(seg_a), ba,
            jnp.asarray(sc_b), jnp.asarray(vb), jnp.asarray(seg_b), bb, n,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

        # grads: pair vs single on the union, mapped back through the sort
        w = jnp.asarray(r.normal(size=(n, d)).astype(np.float32))

        def f_pair(sa, va_, sb, vb_):
            o = csr_softmax_spmm_pair(
                sa, va_, jnp.asarray(seg_a), ba,
                sb, vb_, jnp.asarray(seg_b), bb, n,
            )
            return jnp.sum(o * w)

        def f_single(s_all, v_all):
            o = csr_softmax_spmm(
                s_all, v_all, jnp.asarray(seg_s), bu, n
            )
            return jnp.sum(o * w)

        gsa, gva, gsb, gvb = jax.grad(f_pair, argnums=(0, 1, 2, 3))(
            jnp.asarray(sc_a), jnp.asarray(va),
            jnp.asarray(sc_b), jnp.asarray(vb),
        )
        gs_u, gv_u = jax.grad(f_single, argnums=(0, 1))(
            jnp.asarray(sc_s), jnp.asarray(v_s)
        )
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    gs_ref = np.asarray(gs_u)[inv]
    gv_ref = np.asarray(gv_u)[inv]
    np.testing.assert_allclose(
        np.asarray(gsa), gs_ref[:ea], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gsb), gs_ref[ea:], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gva), gv_ref[:ea], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gvb), gv_ref[ea:], rtol=1e-4, atol=1e-6
    )


def _downstream_of_all_to_all(jaxpr):
    """Variables reachable from any all_to_all output, plus the edge-sized
    op shapes found downstream vs not (recursing into sub-jaxprs)."""
    from jax.extend.core import Var

    reach = set()

    def walk(jx, tainted_invars):
        local = set(tainted_invars)
        for eqn in jx.eqns:
            ins = [v for v in eqn.invars if isinstance(v, Var)]
            tainted = any(v in local for v in ins) or (
                "all_to_all" in eqn.primitive.name
            )
            sub = None
            for k in ("jaxpr", "call_jaxpr"):
                if k in eqn.params:
                    sub = eqn.params[k]
                    break
            if sub is not None:
                core = getattr(sub, "jaxpr", sub)
                t_in = set()
                for iv, ov in zip(ins, core.invars):
                    if iv in local:
                        t_in.add(ov)
                sub_out_tainted = walk(core, t_in)
                for flag, ov in zip(sub_out_tainted, eqn.outvars):
                    if flag or tainted:
                        local.add(ov)
                        reach.add(ov)
                continue
            if tainted:
                for ov in eqn.outvars:
                    local.add(ov)
                    reach.add(ov)
        return [v in local for v in getattr(jx, "outvars", [])]

    walk(jaxpr, set())
    return reach


def _collect_eqn_taint(jaxpr):
    """(shape, tainted) per eqn output var across nested jaxprs."""
    from jax.extend.core import Var

    tainted_vars = _downstream_of_all_to_all(jaxpr)
    rows = []

    def walk(jx):
        for eqn in jx.eqns:
            for k in ("jaxpr", "call_jaxpr"):
                if k in eqn.params:
                    walk(getattr(eqn.params[k], "jaxpr", eqn.params[k]))
            for ov in eqn.outvars:
                if isinstance(ov, Var) and hasattr(ov.aval, "shape"):
                    rows.append(
                        (eqn.primitive.name, tuple(ov.aval.shape),
                         ov in tainted_vars)
                    )

    walk(jaxpr)
    return rows


@pytest.mark.parametrize("split", [False, True])
def test_local_attention_compute_independent_of_collective(split):
    """The schedulability claim at jaxpr level: with the split layout, the
    [El]-edge-sized attention math does NOT data-depend on the all_to_all
    (a latency-hiding scheduler may overlap them); in the unsplit layout
    every edge-sized op sits downstream of it."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    g = _mesh_graph(seed=3)
    model = EncodeTransformDecode(
        message_passing_num=1, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4,
    )
    gj = _jnp(g)
    params = model.init(jax.random.key(0), gj)
    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = _jnp(partition_graph_halo_np(g, 4, split_local=split))

    def per_shard(params, stacked):
        local = jax.tree_util.tree_map(lambda a: a[0], stacked)
        return model.apply(params, local)

    fn = shard_map(
        per_shard, mesh=mesh, in_specs=(P(), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False,
    )
    jaxpr = jax.make_jaxpr(fn)(params, parts)
    rows = _collect_eqn_taint(jaxpr.jaxpr)
    if split:
        el = parts.num_local_edges
        local_sized = [r for r in rows if r[1][:1] == (el,)]
        assert local_sized, "no local-edge-sized ops found"
        tainted = [r for r in local_sized if r[2]]
        assert not tainted, (
            f"local-edge compute downstream of all_to_all: {tainted[:5]}"
        )
    else:
        e_tot = parts.senders.shape[1]
        edge_sized = [r for r in rows if r[1][:1] == (e_tot,)]
        gathers = [r for r in edge_sized if r[0] == "gather" and r[2]]
        assert gathers, (
            "expected unsplit edge gathers downstream of the all_to_all"
        )


def test_trainer_split_attention_matches_plain(tmp_path):
    """Trainer(graph_partition, transformer): partition_overlap_attention
    ON (the default, split-edge layout) must reproduce the OFF losses."""
    from graphphysics_tpu.dataset import GraphLoader
    from graphphysics_tpu.training.parse_parameters import (
        get_dataset,
        get_preprocessing,
    )
    from graphphysics_tpu.training.trainer import Trainer
    from tests.fixtures import write_cylinder_h5

    h5_path, meta_path = write_cylinder_h5(
        str(tmp_path), num_traj=1, steps=6, nx=8, ny=6
    )
    param = {
        "dataset": {"extension": "h5", "h5_path": h5_path,
                    "meta_path": meta_path, "khop": 1},
        "model": {"type": "transformer", "message_passing_num": 1,
                  "hidden_size": 16, "node_input_size": 2, "output_size": 2,
                  "edge_input_size": 0, "num_heads": 4},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0.02,
                                              "noise_index_start": [0],
                                              "noise_index_end": [2],
                                              "masking": 0},
                            "world_pos_parameters": {"use": False}},
    }

    def run(overlap):
        ds = get_dataset(param, get_preprocessing(param))
        loader = GraphLoader(ds, batch_size=2, shuffle=True, prefetch=0)
        tr = Trainer(
            param, learning_rate=1e-3, warmup=2, graph_partition=4,
            partition_overlap_attention=overlap,
            checkpoint_dir=str(tmp_path / f"ck_{overlap}"),
            metrics_path=None, rollout_dir=None, log_every=5,
        )
        return tr.fit(loader, num_epochs=1), tr

    h_on, t_on = run(True)
    h_off, t_off = run(False)
    assert t_on._split_attention() and not t_off._split_attention()
    np.testing.assert_allclose(
        h_on["train_loss"], h_off["train_loss"], rtol=5e-3
    )


def test_split_partitioned_rollout_matches_single_device():
    """partition_frames_np(split_local=True): the partitioned transformer
    ROLLOUT through the overlap layout equals the single-device rollout
    (partitioned validation's path when overlap is on)."""
    from graphphysics_tpu.core.graph import stack_graphs
    from graphphysics_tpu.parallel.dp import partitioned_rollout
    from graphphysics_tpu.parallel.graph_partition import partition_frames_np
    from graphphysics_tpu.training.rollout import rollout

    base = _mesh_graph(seed=5)
    r = np.random.default_rng(9)
    frames = []
    for _ in range(3):
        x = np.asarray(base.x).copy()
        x[:, 0:2] = r.normal(size=x[:, 0:2].shape).astype(np.float32)
        frames.append(
            base.replace(
                x=x, y=r.normal(size=base.y.shape).astype(np.float32)
            )
        )

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=0, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeTransformDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        output_size=2, hidden_size=16, num_heads=4,
    )
    sim = Simulator(config=cfg, model=model)
    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(frames))
    g0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    variables = sim.init({"params": jax.random.key(0)}, g0)
    ref_preds, ref_targets = rollout(
        sim, variables, stacked, jax.random.key(1)
    )

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = partition_frames_np(frames, 4, halo=True, split_local=True)
    assert parts.num_local_edges is not None
    parts = jax.tree_util.tree_map(jnp.asarray, parts)
    preds, targets = partitioned_rollout(
        sim, variables, parts, mesh, jax.random.key(1)
    )
    np.testing.assert_allclose(
        np.asarray(preds), np.asarray(ref_preds), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(targets), np.asarray(ref_targets), rtol=1e-6
    )


def test_split_2d_dp_graph_step_matches_unsplit():
    """The 2-D (data x graph) transformer step through the split-edge
    overlap layout equals the unsplit 2-D step (pod-scale sharding)."""
    from graphphysics_tpu.core.graph import stack_graphs
    from graphphysics_tpu.parallel import (
        make_dp_graph_parallel_train_step,
        make_mesh,
    )
    from graphphysics_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=0, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeTransformDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        output_size=2, hidden_size=16, num_heads=4,
    )
    sim = Simulator(config=cfg, model=model)
    g0 = _mesh_graph(seed=7)
    gj = _jnp(g0)
    variables = sim.init({"params": jax.random.key(0)}, gj)
    tx = optax.adamw(1e-3)

    def fresh_state():
        return {
            "params": jax.tree_util.tree_map(jnp.array, variables["params"]),
            "normalizer": jax.tree_util.tree_map(
                jnp.array, variables["normalizer"]
            ),
            "opt_state": tx.init(
                jax.tree_util.tree_map(jnp.array, variables["params"])
            ),
            "step": jnp.zeros((), jnp.int32),
        }

    mesh2d = make_mesh(8, (DATA_AXIS, GRAPH_AXIS), shape=(2, 4))
    step2d = make_dp_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh2d
    )
    sh = NamedSharding(mesh2d, P(DATA_AXIS, GRAPH_AXIS))

    def batch_of(split):
        graphs = [_mesh_graph(seed=7), _mesh_graph(seed=8)]
        trial = partition_graph_halo_np(graphs[0], 4, split_local=split)
        if split:
            el = trial.num_local_edges
            eb = (el, trial.senders.shape[1] - el)
        else:
            eb = trial.senders.shape[1]
        hb = trial.halo_send_idx.shape[2]
        parts = [
            partition_graph_halo_np(
                g, 4, edge_budget_local=eb, halo_budget=hb,
                split_local=split,
            )
            for g in graphs
        ]
        stacked = _jnp(stack_graphs(parts))
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), stacked
        )

    _, loss_u = step2d(fresh_state(), batch_of(False))
    _, loss_s = step2d(fresh_state(), batch_of(True))
    np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-5)
