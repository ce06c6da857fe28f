"""Padded-vs-unpadded equivalence (SURVEY.md §4): model outputs on a graph
padded with extra nodes/edges must equal the outputs on the tightly-padded
graph for all real rows."""

import jax
import jax.numpy as jnp
import numpy as np

from graphphysics_tpu.core.graph import pad_graph_np
from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.topology.build import to_undirected


def _raw(n=60, seed=0):
    r = np.random.default_rng(seed)
    s = r.integers(0, n, 3 * n).astype(np.int32)
    t = (s + r.integers(1, 10, 3 * n)).astype(np.int32) % n
    S, R = to_undirected(s, t)
    x = r.normal(size=(n, 4)).astype(np.float32)
    x[:, 2] = r.integers(0, 7, n)
    pos = r.normal(size=(n, 2)).astype(np.float32)
    ea = r.normal(size=(len(S), 3)).astype(np.float32)
    y = r.normal(size=(n, 2)).astype(np.float32)
    return x, pos, S, R, ea, y


def _pair(n_extra, e_extra):
    x, pos, S, R, ea, y = _raw()
    n, e = len(x), len(S)
    tight = pad_graph_np(x, pos, S, R, n_pad=n, e_pad=e, edge_attr=ea, y=y,
                         node_type_index=2)
    loose = pad_graph_np(x, pos, S, R, n_pad=n + n_extra, e_pad=e + e_extra,
                         edge_attr=ea, y=y, node_type_index=2)
    j = lambda g: jax.tree_util.tree_map(jnp.asarray, g)
    return j(tight), j(loose), n


def test_epd_padding_equivalence():
    tight, loose, n = _pair(24, 100)
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    params = model.init(jax.random.key(0), tight)
    out_t = np.asarray(model.apply(params, tight))
    out_l = np.asarray(model.apply(params, loose))
    np.testing.assert_allclose(out_l[:n], out_t[:n], rtol=1e-5, atol=1e-6)


def test_transformer_padding_equivalence():
    tight, loose, n = _pair(24, 100)
    model = EncodeTransformDecode(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=16, num_heads=4,
    )
    params = model.init(jax.random.key(0), tight)
    out_t = np.asarray(model.apply(params, tight))
    out_l = np.asarray(model.apply(params, loose))
    np.testing.assert_allclose(out_l[:n], out_t[:n], rtol=1e-5, atol=1e-6)
