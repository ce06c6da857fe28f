"""remat=True: rematerialized blocks compute the same function (forward AND
gradients) as the unrolled blocks, including the layouts whose block
__call__ takes non-array arguments that must be remat statics —
``ell_degree`` (int), ``csr_max_chunks`` (int), ``partition_axis`` (str)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from graphphysics_tpu.core.graph import (
    pad_graph_csr_np,
    pad_graph_ell_np,
    pad_graph_np,
)
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.parallel import make_mesh, shard_batch
from graphphysics_tpu.parallel.dp import graph_parallel_forward
from graphphysics_tpu.parallel.graph_partition import (
    partition_graph_np,
    unpartition_rows,
)
from graphphysics_tpu.parallel.mesh import GRAPH_AXIS
from graphphysics_tpu.topology.build import to_undirected


def _sym_raw(n=128, seed=0, f=4):
    r = np.random.default_rng(seed)
    s = r.integers(0, n, 3 * n).astype(np.int32)
    t = (s + r.integers(1, 16, 3 * n)).astype(np.int32) % n
    S, R = to_undirected(s, t)
    x = r.normal(size=(n, f)).astype(np.float32)
    x[:, 2] = r.integers(0, 7, n)
    pos = r.normal(size=(n, 2)).astype(np.float32)
    ea = r.normal(size=(len(S), 3)).astype(np.float32)
    return x, pos, S, R, ea


def _jnp(g):
    return jax.tree_util.tree_map(jnp.asarray, g)


def _epd(remat, scan_blocks=False, edge_input=3):
    return EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=edge_input,
        output_size=2, hidden_size=16, remat=remat, scan_blocks=scan_blocks,
    )


def _etd(remat, scan_blocks=False):
    return EncodeTransformDecode(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4, remat=remat, scan_blocks=scan_blocks,
    )


def _assert_same_fn(base, rem, params, gj, rtol=1e-5, atol=1e-6):
    out_b = base.apply(params, gj)
    out_r = rem.apply(params, gj)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_r), rtol=rtol, atol=atol
    )

    def loss(m):
        return lambda p: (m.apply(p, gj) ** 2).sum()

    gb = jax.grad(loss(base))(params)
    gr = jax.grad(loss(rem))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gb), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_epd_remat_matches_coo(scan_blocks):
    x, pos, S, R, ea = _sym_raw()
    g = pad_graph_np(x, pos, S, R, n_pad=128, e_pad=len(S) + 32,
                     edge_attr=ea, node_type_index=2)
    gj = _jnp(g)
    base, rem = _epd(False, scan_blocks), _epd(True, scan_blocks)
    params = base.init(jax.random.key(0), gj)
    _assert_same_fn(base, rem, params, gj)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_etd_remat_matches_coo(scan_blocks):
    x, pos, S, R, _ = _sym_raw(seed=1)
    g = pad_graph_np(x, pos, S, R, n_pad=128, e_pad=len(S) + 32,
                     node_type_index=2)
    gj = _jnp(g)
    base, rem = _etd(False, scan_blocks), _etd(True, scan_blocks)
    params = base.init(jax.random.key(0), gj)
    _assert_same_fn(base, rem, params, gj)


def test_epd_remat_ell_layout():
    """ELL layout: ``ell_degree`` (Python int) rides through nn.remat as a
    static argument."""
    x, pos, S, R, ea = _sym_raw(seed=2)
    g = pad_graph_ell_np(x, pos, S, R, n_pad=128, degree=32,
                         edge_attr=ea, node_type_index=2)
    gj = _jnp(g)
    base, rem = _epd(False), _epd(True)
    params = base.init(jax.random.key(0), gj)
    _assert_same_fn(base, rem, params, gj)


def test_etd_remat_csr_layout():
    """CSR layout: ``csr_max_chunks`` (Python int) is a remat static; the
    Pallas kernel runs in interpret mode on CPU. Forward-only here: interpret
    mode executes the kernel via io_callback, whose OrderedIOEffect cannot be
    partial-evaled under jax.checkpoint — on real TPU pallas_call is a plain
    primitive and the gradient path works (verified on-chip)."""
    x, pos, S, R, _ = _sym_raw(n=300, seed=3)
    g = pad_graph_csr_np(x, pos, S, R, n_pad=512, e_pad=2048)
    gj = _jnp(g)
    base, rem = _etd(False), _etd(True)
    with pltpu.force_tpu_interpret_mode():
        params = base.init(jax.random.key(0), gj)
        out_b = base.apply(params, gj)
        out_r = rem.apply(params, gj)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_r), rtol=2e-5, atol=2e-6
    )


def test_epd_remat_partitioned_forward():
    """Edge-partitioned SPMD: ``partition_axis`` (str mesh-axis name) is a
    remat static; partitioned remat forward matches the single-device
    non-remat forward."""
    x, pos, S, R, ea = _sym_raw(n=256, seed=4)
    y = np.random.default_rng(5).normal(size=(256, 2)).astype(np.float32)
    g = pad_graph_np(x, pos, S, R, n_pad=256, e_pad=len(S) + 32,
                     edge_attr=ea, y=y, node_type_index=2)
    gj = _jnp(g)
    base, rem = _epd(False), _epd(True)
    params = base.init(jax.random.key(0), gj)
    ref = base.apply(params, gj)

    mesh = make_mesh(4, (GRAPH_AXIS,))
    parts = shard_batch(_jnp(partition_graph_np(g, 4)), mesh, GRAPH_AXIS)
    out = graph_parallel_forward(rem, params, parts, mesh)
    np.testing.assert_allclose(
        unpartition_rows(np.asarray(out)), np.asarray(ref), rtol=2e-4, atol=1e-5
    )
