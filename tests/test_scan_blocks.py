"""scan_blocks parity: the nn.scan block stack computes the same function as
the unrolled loop — verified by restacking unrolled per-block params into the
scanned [L]-leading layout and comparing outputs + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from tests.conftest import make_test_graph


def _stack_block_params(params, num_blocks):
    """unrolled {block_0..block_{L-1}: tree} -> scanned {blocks: {block: tree
    with leading [L]}} (other top-level entries pass through)."""
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    per_block = [params[f"block_{i}"] for i in range(num_blocks)]
    out["blocks"] = {
        "block": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *per_block
        )
    }
    return out


@pytest.mark.parametrize("kind", ["epd", "transformer"])
def test_scan_blocks_matches_unrolled(kind):
    g = make_test_graph()
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    L = 3
    if kind == "epd":
        mk = lambda scan: EncodeProcessDecode(  # noqa: E731
            message_passing_num=L, node_input_size=gj.x.shape[1],
            edge_input_size=gj.edge_attr.shape[1], output_size=2,
            hidden_size=16, scan_blocks=scan,
        )
    else:
        mk = lambda scan: EncodeTransformDecode(  # noqa: E731
            message_passing_num=L, node_input_size=gj.x.shape[1],
            output_size=2, hidden_size=16, num_heads=4, scan_blocks=scan,
        )
    unrolled, scanned = mk(False), mk(True)
    params_u = unrolled.init(jax.random.key(0), gj)["params"]
    params_s_tmpl = scanned.init(jax.random.key(0), gj)["params"]
    params_s = _stack_block_params(params_u, L)
    assert jax.tree_util.tree_structure(params_s) == jax.tree_util.tree_structure(
        params_s_tmpl
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params_s),
        jax.tree_util.tree_leaves(params_s_tmpl),
    ):
        assert a.shape == b.shape

    out_u = unrolled.apply({"params": params_u}, gj)
    out_s = scanned.apply({"params": params_s}, gj)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_u), rtol=2e-5, atol=1e-6
    )

    # gradients agree too (scan transpose == unrolled backward)
    def loss(m, p):
        return (m.apply({"params": p}, gj) ** 2).sum()

    gu = jax.grad(lambda p: loss(unrolled, p))(params_u)
    gs = jax.grad(lambda p: loss(scanned, p))(params_s)
    gs_expected = _stack_block_params(gu, L)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gs_expected)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-5)
