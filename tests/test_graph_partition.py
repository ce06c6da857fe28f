"""Edge-partitioned graph parallelism: partitioned forward/train step must
reproduce the unpartitioned single-device results on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphphysics_tpu.core.graph import pad_graph_np
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig
from graphphysics_tpu.parallel import make_mesh, shard_batch
from graphphysics_tpu.parallel.dp import (
    graph_parallel_forward,
    make_graph_parallel_train_step,
)
from graphphysics_tpu.parallel.graph_partition import (
    partition_graph_halo_np,
    partition_graph_np,
    unpartition_rows,
)
from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
from graphphysics_tpu.topology.build import to_undirected


def _mesh_graph(n=256, seed=0):
    """Symmetric random graph padded to n nodes."""
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


def _partition(g, num_parts, halo):
    fn = partition_graph_halo_np if halo else partition_graph_np
    return fn(g, num_parts)


def test_partition_graph_roundtrip_nodes():
    g = _mesh_graph()
    parts = partition_graph_np(g, 4)
    assert parts.x.shape == (4, 64, 4)
    np.testing.assert_allclose(unpartition_rows(parts.x), np.asarray(g.x))
    # edges preserved: (global sender, global receiver) sets match
    got = set()
    for p in range(4):
        m = parts.edge_mask[p]
        for s, r in zip(parts.senders[p][m], parts.receivers[p][m] + p * 64):
            got.add((int(s), int(r)))
    em = np.asarray(g.edge_mask)
    expected = set(
        zip(np.asarray(g.senders)[em].tolist(), np.asarray(g.receivers)[em].tolist())
    )
    assert got == expected


@pytest.mark.parametrize("halo", [False, True])
def test_partitioned_epd_forward_matches_single_device(halo):
    g = _mesh_graph()
    gj = _jnp(g)
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    params = model.init(jax.random.key(0), gj)
    ref = model.apply(params, gj)

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = shard_batch(_jnp(_partition(g, 4, halo)), mesh, GRAPH_AXIS)
    out = graph_parallel_forward(model, params, parts, mesh)
    np.testing.assert_allclose(
        unpartition_rows(np.asarray(out)), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("halo", [False, True])
def test_partitioned_transformer_forward_matches_single_device(halo):
    g = _mesh_graph(seed=1)
    gj = _jnp(g)
    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4,
    )
    params = model.init(jax.random.key(0), gj)
    ref = model.apply(params, gj)

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = shard_batch(_jnp(_partition(g, 4, halo)), mesh, GRAPH_AXIS)
    out = graph_parallel_forward(model, params, parts, mesh)
    np.testing.assert_allclose(
        unpartition_rows(np.asarray(out)), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("halo", [False, True])
def test_partitioned_train_step_matches_single_device(halo):
    g = _mesh_graph(seed=2)
    gj = _jnp(g)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=8,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, gj)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    # single-device reference
    from graphphysics_tpu.training.losses import l2_loss

    def loss_fn(p):
        (out, tgt, _), mut = sim.apply(
            {"params": p, "normalizer": state["normalizer"]}, gj,
            is_training=True, mutable=["normalizer"],
        )
        nt = gj.x[:, 2].astype(jnp.int32)
        return l2_loss(tgt, out, nt, [NodeType.NORMAL, NodeType.OUTFLOW],
                       node_valid=gj.node_mask), mut["normalizer"]

    (ref_loss, ref_norm), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state["params"])

    mesh = make_mesh(4, (GRAPH_AXIS,))
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    parts = shard_batch(_jnp(_partition(g, 4, halo)), mesh, GRAPH_AXIS)
    new_state, loss = step(state, parts)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    got = new_state["normalizer"]["node_normalizer"]["state"]
    exp = ref_norm["node_normalizer"]["state"]
    np.testing.assert_allclose(float(got.acc_count), float(exp.acc_count))
    np.testing.assert_allclose(
        np.asarray(got.acc_sum), np.asarray(exp.acc_sum), rtol=1e-4, atol=1e-5
    )


def test_halo_partition_structure():
    """Halo senders resolve to the same global rows as the COO partition:
    simulating the exchange table in numpy reproduces every masked edge."""
    g = _mesh_graph(seed=3)
    num_parts = 4
    nl = g.num_nodes // num_parts
    parts = partition_graph_halo_np(g, num_parts)
    halo = np.asarray(parts.halo_send_idx)  # [P(owner q), P(dest p), B]
    b = halo.shape[-1]
    x = np.asarray(g.x)

    ref = partition_graph_np(g, num_parts)
    for p in range(num_parts):
        local = x[p * nl : (p + 1) * nl]
        # rows device p receives: from each q, the rows q sends to p
        recv = np.concatenate(
            [x[q * nl : (q + 1) * nl][halo[q, p]] for q in range(num_parts)]
        )
        table = np.concatenate([local, recv])
        m = np.asarray(parts.edge_mask[p])
        got = table[np.asarray(parts.senders[p])[m]]
        expected = x[np.asarray(ref.senders[p])[m]]  # COO senders are global
        np.testing.assert_array_equal(got, expected)
        assert halo.shape == (num_parts, num_parts, b)
        assert (np.asarray(parts.senders[p]) < nl + num_parts * b).all()


@pytest.mark.parametrize("halo", [False, True])
def test_partitioned_rollout_matches_single_device(halo):
    """Partitioned rollout over 4 shards == single-device rollout."""
    from graphphysics_tpu.parallel.dp import partitioned_rollout
    from graphphysics_tpu.parallel.graph_partition import partition_frames_np
    from graphphysics_tpu.training.rollout import rollout

    base = _mesh_graph(seed=5)
    r = np.random.default_rng(9)
    frames = []
    for _ in range(3):
        x = np.asarray(base.x).copy()
        x[:, 0:2] = r.normal(size=x[:, 0:2].shape).astype(np.float32)
        frames.append(base.replace(x=x, y=r.normal(size=base.y.shape).astype(np.float32)))

    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=8,
    )
    sim = Simulator(config=cfg, model=model)
    from graphphysics_tpu.core.graph import stack_graphs

    stacked = jax.tree_util.tree_map(jnp.asarray, stack_graphs(frames))
    g0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    variables = sim.init({"params": jax.random.key(0)}, g0)
    ref_preds, ref_targets = rollout(sim, variables, stacked, jax.random.key(1))

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = partition_frames_np(frames, 4, halo=halo)
    parts = jax.tree_util.tree_map(jnp.asarray, parts)
    preds, targets = partitioned_rollout(
        sim, variables, parts, mesh, jax.random.key(1)
    )
    # global [T, N, d]: parts concatenated on the node axis in order
    np.testing.assert_allclose(
        np.asarray(preds), np.asarray(ref_preds), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(targets), np.asarray(ref_targets),
                               rtol=1e-6)


@pytest.mark.parametrize("halo", [False, True])
def test_overlap_exchange_knob_same_function(halo):
    """overlap_exchange splits the sender term out of the first edge-MLP
    layer (projected pre-collective); same param tree, same outputs as the
    fused-concat partitioned path."""
    g = _mesh_graph(seed=7)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from graphphysics_tpu.models.layers import GraphNetBlock

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = shard_batch(_jnp(_partition(g, 4, halo)), mesh, GRAPH_AXIS)
    h = 16
    r0 = np.random.default_rng(8)
    x_full = jnp.asarray(r0.normal(size=(256, h)), jnp.float32)
    ea = jnp.asarray(
        r0.normal(size=(parts.senders.shape[0] * parts.senders.shape[1], h)),
        jnp.float32,
    )
    blk_ov = GraphNetBlock(hidden_size=h, overlap_exchange=True)
    blk_fu = GraphNetBlock(hidden_size=h, overlap_exchange=False)
    xp = x_full.reshape(4, 64, h)
    eap = ea.reshape(4, -1, h)

    def fwd(blk, params):
        def inner(x, ea, s, r, em, hs):
            hs = None if hs is None else hs[0]
            xn, en = blk.apply(
                params, x[0], ea[0], s[0], r[0], em[0],
                None, None, GRAPH_AXIS, hs,
            )
            return xn[None], en[None]
        specs = (P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                 P(GRAPH_AXIS),
                 P(GRAPH_AXIS) if parts.halo_send_idx is not None else None)
        return shard_map(
            inner, mesh=mesh,
            in_specs=specs,
            out_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS)),
        )(xp, eap, parts.senders, parts.receivers, parts.edge_mask,
          parts.halo_send_idx)

    bparams = blk_fu.init(
        jax.random.key(1), x_full[:64], ea[: eap.shape[1]],
        jnp.zeros_like(parts.senders[0]), jnp.zeros_like(parts.receivers[0]),
    )
    x_ov, e_ov = fwd(blk_ov, bparams)
    x_fu, e_fu = fwd(blk_fu, bparams)
    np.testing.assert_allclose(np.asarray(x_ov), np.asarray(x_fu),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_ov), np.asarray(e_fu),
                               rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------- CSR compose
# edge_layout="csr" x graph_partition: the fused Pallas attention kernel
# running INSIDE the edge-partitioned step (per-part receiver-sorted edges +
# local kernel bounds). Kernel in interpret mode on CPU.

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from graphphysics_tpu.ops.pallas_attention import (  # noqa: E402
    compute_block_bounds,
)


def test_partition_csr_structure():
    g = _mesh_graph(n=1024, seed=11)
    num_parts = 4
    nl = 1024 // num_parts
    parts = partition_graph_np(g, num_parts, csr=True)
    assert parts.csr_bounds is not None and parts.csr_max_chunks >= 1
    ref = partition_graph_np(g, num_parts)
    for p in range(num_parts):
        m = np.asarray(parts.edge_mask[p])
        k = int(m.sum())
        r_loc = np.asarray(parts.receivers[p])
        # real edges receiver-sorted; padding (nl-1) keeps the array sorted
        assert np.all(np.diff(r_loc[:k]) >= 0)
        assert np.all(r_loc[k:] == nl - 1)
        np.testing.assert_array_equal(
            np.asarray(parts.csr_bounds[p]),
            compute_block_bounds(r_loc, nl, num_real_edges=k),
        )
        # same edge multiset as the unsorted partition
        got = sorted(zip(np.asarray(parts.senders[p])[m].tolist(),
                         r_loc[m].tolist()))
        mr = np.asarray(ref.edge_mask[p])
        want = sorted(zip(np.asarray(ref.senders[p])[mr].tolist(),
                          np.asarray(ref.receivers[p])[mr].tolist()))
        assert got == want


def test_partition_halo_csr_senders_consistent():
    """Halo senders follow the CSR per-part edge order: resolving them
    through the simulated exchange table matches the global-sender CSR
    partition row for row."""
    g = _mesh_graph(n=1024, seed=12)
    num_parts = 4
    nl = 1024 // num_parts
    parts = partition_graph_halo_np(g, num_parts, csr=True)
    ref = partition_graph_np(g, num_parts, csr=True)
    np.testing.assert_array_equal(
        np.asarray(parts.receivers), np.asarray(ref.receivers)
    )
    np.testing.assert_array_equal(
        np.asarray(parts.csr_bounds), np.asarray(ref.csr_bounds)
    )
    halo = np.asarray(parts.halo_send_idx)
    x = np.asarray(g.x)
    for p in range(num_parts):
        local = x[p * nl : (p + 1) * nl]
        recv = np.concatenate(
            [x[q * nl : (q + 1) * nl][halo[q, p]] for q in range(num_parts)]
        )
        table = np.concatenate([local, recv])
        m = np.asarray(parts.edge_mask[p])
        np.testing.assert_array_equal(
            table[np.asarray(parts.senders[p])[m]],
            x[np.asarray(ref.senders[p])[m]],
        )


@pytest.mark.parametrize("halo", [False, True])
@pytest.mark.parametrize("num_parts", [2, 4])
def test_partitioned_csr_transformer_matches_single_device(halo, num_parts):
    """Fused-kernel attention inside the partitioned transformer forward ==
    unpartitioned single-device forward (multi-block per part at parts=2)."""
    g = _mesh_graph(n=1024, seed=13)
    gj = _jnp(g)
    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4,
    )
    params = model.init(jax.random.key(0), gj)
    ref = model.apply(params, gj)

    mesh = make_mesh(num_parts, (GRAPH_AXIS,))
    fn = partition_graph_halo_np if halo else partition_graph_np
    parts = shard_batch(_jnp(fn(g, num_parts, csr=True)), mesh, GRAPH_AXIS)
    with pltpu.force_tpu_interpret_mode():
        out = graph_parallel_forward(model, params, parts, mesh)
    np.testing.assert_allclose(
        unpartition_rows(np.asarray(out)), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_partitioned_csr_train_step_matches_single_device():
    """Full edge-partitioned train step with the fused kernel (fwd + custom
    VJP): loss == single-device step, and updated params == the COO
    partitioned step (same sharded fp reduction order, so the comparison
    isolates exactly the kernel against the XLA segment ops)."""
    g = _mesh_graph(n=512, seed=14)
    gj = _jnp(g)
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
    variables = sim.init({"params": jax.random.key(0)}, gj)
    # SGD, not adam: the param delta is then LINEAR in the gradient, so the
    # comparison tests gradient parity directly (adam's g/(|g|+eps) blows up
    # fp noise on near-zero-gradient leaves)
    tx = optax.sgd(0.1)
    state = {
        "params": variables["params"],
        "normalizer": variables["normalizer"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    from graphphysics_tpu.training.losses import l2_loss

    def loss_fn(p):
        (out, tgt, _), mut = sim.apply(
            {"params": p, "normalizer": state["normalizer"]}, gj,
            is_training=True, mutable=["normalizer"],
        )
        nt = gj.x[:, 2].astype(jnp.int32)
        return l2_loss(tgt, out, nt, [NodeType.NORMAL, NodeType.OUTFLOW],
                       node_valid=gj.node_mask), mut["normalizer"]

    ref_loss, _ = loss_fn(state["params"])

    def fresh_state():
        v = jax.tree_util.tree_map(
            lambda a: jnp.array(np.asarray(a)), variables
        )
        return {
            "params": v["params"],
            "normalizer": v["normalizer"],
            "opt_state": tx.init(v["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    mesh = make_mesh(4, (GRAPH_AXIS,))
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    parts_coo = shard_batch(
        _jnp(partition_graph_halo_np(g, 4)), mesh, GRAPH_AXIS
    )
    parts_csr = shard_batch(
        _jnp(partition_graph_halo_np(g, 4, csr=True)), mesh, GRAPH_AXIS
    )
    coo_state, coo_loss = step(fresh_state(), parts_coo)
    with pltpu.force_tpu_interpret_mode():
        new_state, loss = step(fresh_state(), parts_csr)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(coo_loss), rtol=1e-6)
    got = jax.tree_util.tree_leaves(new_state["params"])
    exp = jax.tree_util.tree_leaves(coo_state["params"])
    for a, b in zip(got, exp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5
        )


def test_partitioned_csr_rollout_matches_single_device():
    from graphphysics_tpu.parallel.dp import partitioned_rollout
    from graphphysics_tpu.parallel.graph_partition import partition_frames_np
    from graphphysics_tpu.training.rollout import rollout
    from graphphysics_tpu.core.graph import stack_graphs

    base = _mesh_graph(n=512, seed=15)
    r = np.random.default_rng(16)
    frames = []
    for _ in range(3):
        x = np.asarray(base.x).copy()
        x[:, 0:2] = r.normal(size=x[:, 0:2].shape).astype(np.float32)
        frames.append(base.replace(
            x=x, y=r.normal(size=base.y.shape).astype(np.float32)
        ))
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
    ref_preds, ref_targets = rollout(sim, variables, stacked, jax.random.key(1))

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = partition_frames_np(frames, 4, halo=True, csr=True)
    parts = jax.tree_util.tree_map(jnp.asarray, parts)
    with pltpu.force_tpu_interpret_mode():
        preds, targets = partitioned_rollout(
            sim, variables, parts, mesh, jax.random.key(1)
        )
    np.testing.assert_allclose(
        np.asarray(preds), np.asarray(ref_preds), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(targets), np.asarray(ref_targets), rtol=1e-6
    )


@pytest.mark.parametrize("model_kind", ["epd", "tf"])
def test_bf16_halo_forward_close_to_f32(model_kind):
    """halo_dtype="bf16" ships boundary rows 16-bit over the per-layer
    all_to_all with f32 local math (ops/halo.halo_table): outputs must stay
    within bf16 rounding of the exact partitioned forward."""
    g = _mesh_graph(seed=11)
    gj = _jnp(g)
    if model_kind == "epd":
        model = EncodeProcessDecode(
            message_passing_num=2, node_input_size=4, edge_input_size=3,
            output_size=2, hidden_size=16,
        )
    else:
        model = EncodeTransformDecode(
            message_passing_num=2, node_input_size=4, output_size=2,
            hidden_size=16, num_heads=4,
        )
    params = model.init(jax.random.key(0), gj)
    ref = model.apply(params, gj)

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = _partition(g, 4, halo=True).replace(halo_dtype="bf16")
    out = graph_parallel_forward(model, params, _jnp(parts), mesh)
    np.testing.assert_allclose(
        unpartition_rows(np.asarray(out)), np.asarray(ref),
        rtol=0.05, atol=5e-3,
    )


def test_bf16_halo_all_to_all_ships_16bit():
    """The compiled HLO's halo all_to_all must carry bf16 operands in BOTH
    directions (the backward cotangent exchange too) — the whole point of
    the knob is halving the wire bytes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    g = _mesh_graph(seed=12)
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    gj = _jnp(g)
    params = model.init(jax.random.key(0), gj)
    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = _jnp(_partition(g, 4, halo=True).replace(halo_dtype="bf16"))

    def per_shard(p, stacked):
        graph = jax.tree_util.tree_map(lambda a: a[0], stacked)

        def loss_fn(p):
            out = model.apply(p, graph)
            return jnp.sum(out**2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return jax.lax.psum(loss, GRAPH_AXIS), grads

    fn = jax.jit(
        shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(GRAPH_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    sharded = shard_batch(parts, mesh, GRAPH_AXIS)
    # assert on the LOWERED StableHLO (the program we hand the backend):
    # the CPU backend's float-normalization pass upcasts bf16 collectives
    # it cannot run natively, so the post-compile HLO shows f32 on CPU —
    # a backend artifact; TPU runs bf16 collectives as written.
    hlo = fn.lower(params, sharded).as_text()
    a2a_lines = [
        ln for ln in hlo.splitlines() if "stablehlo.all_to_all" in ln
    ]
    assert a2a_lines, "no all_to_all in the lowered halo step"
    f32_lines = [ln for ln in a2a_lines if "f32" in ln]
    bf16_lines = [ln for ln in a2a_lines if "bf16" in ln]
    # forward exchange AND the transposed backward cotangent exchange
    assert len(bf16_lines) >= 2, f"halo all_to_all not in bf16: {a2a_lines}"
    assert not f32_lines, f"f32 all_to_all leaked: {f32_lines}"
    # and it still runs
    loss, _ = fn(params, sharded)
    assert np.isfinite(float(loss))


def test_bf16_halo_train_step_loss_close(monkeypatch):
    """End-to-end partitioned train step with bf16 halo: loss and updated
    normalizer stats stay within 16-bit-rounding distance of the exact
    partitioned step."""
    g = _mesh_graph(seed=13)
    gj = _jnp(g)
    cfg = SimulatorConfig(
        node_input_size=2 + NodeType.SIZE, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=cfg.node_input_size,
        edge_input_size=3, output_size=2, hidden_size=8,
    )
    sim = Simulator(config=cfg, model=model)
    variables = sim.init({"params": jax.random.key(0)}, gj)
    tx = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=1e-4)

    def fresh_state():
        # deep-copy: the partitioned train step donates its state buffers
        return jax.tree_util.tree_map(
            jnp.array,
            {
                "params": variables["params"],
                "normalizer": variables["normalizer"],
                "opt_state": tx.init(variables["params"]),
                "step": jnp.zeros((), jnp.int32),
            },
        )

    mesh = make_mesh(4, (GRAPH_AXIS,))
    step = make_graph_parallel_train_step(
        sim, tx, [NodeType.NORMAL, NodeType.OUTFLOW], mesh
    )
    exact = _partition(g, 4, halo=True)
    _, exact_loss = step(fresh_state(), shard_batch(_jnp(exact), mesh, GRAPH_AXIS))
    wired = exact.replace(halo_dtype="bf16")
    _, bf16_loss = step(fresh_state(), shard_batch(_jnp(wired), mesh, GRAPH_AXIS))
    np.testing.assert_allclose(float(bf16_loss), float(exact_loss), rtol=0.02)
