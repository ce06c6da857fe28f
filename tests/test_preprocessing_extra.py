"""Additional preprocessing coverage: 3D rotation invariants, noise
curriculum, min-distance feature (mirrors reference test_preprocessing)."""

import math

import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.dataset.preprocessing import add_noise, random_3d_rotate
from graphphysics_tpu.dataset.sample import RawSample
from graphphysics_tpu.topology.build import min_distance_to_type


def _sample3d(rng, n=40):
    x = rng.normal(size=(n, 8)).astype(np.float32)
    x[:, 6] = 0  # node type col
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    y = rng.normal(size=(n, 3)).astype(np.float32)
    return RawSample(x=x, pos=pos, y=y)


def test_random_3d_rotate_preserves_norms(rng):
    s = _sample3d(rng)
    pos0, y0 = s.pos.copy(), s.y.copy()
    feat0 = s.x[:, 0:3].copy()
    out = random_3d_rotate(s, rng, feature_indices=[(0, 3)])
    # rotations preserve row norms and pairwise distances
    np.testing.assert_allclose(
        np.linalg.norm(out.pos, axis=1), np.linalg.norm(pos0, axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(out.x[:, 0:3], axis=1), np.linalg.norm(feat0, axis=1),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.linalg.norm(out.y[:, 0:3], axis=1), np.linalg.norm(y0, axis=1),
        rtol=1e-4,
    )
    # actually rotated (not identity)
    assert np.abs(out.pos - pos0).max() > 1e-3


def test_noise_curriculum_scale(rng):
    n = 2000
    x = np.zeros((n, 4), np.float32)
    s = RawSample(x=x.copy(), pos=np.zeros((n, 2), np.float32))
    # node type col 2 all NORMAL
    out = add_noise(s, rng, [0], [2], 0.1, node_type_index=2, t=1.0)
    # t=1: scale = 10*0.1*(1+cos(pi)) = 0
    assert np.abs(out.x[:, 0:2]).max() == 0.0
    s2 = RawSample(x=x.copy(), pos=np.zeros((n, 2), np.float32))
    out2 = add_noise(s2, rng, [0], [2], 0.1, node_type_index=2, t=0.0)
    # t=0: scale = 10*0.1*2 = 2
    assert abs(out2.x[:, 0:2].std() - 2.0) < 0.1


def test_min_distance_to_type(rng):
    pos = np.array([[0, 0], [1, 0], [3, 0]], np.float32)
    nt = np.array([NodeType.WALL_BOUNDARY, NodeType.NORMAL, NodeType.NORMAL])
    d = min_distance_to_type(pos, nt, int(NodeType.WALL_BOUNDARY))
    np.testing.assert_allclose(d, [0.0, 1.0, 3.0], rtol=1e-6)


def test_fixed_3d_rotate_matches_reference_convention(rng):
    """90 deg around z with the reference's matrix layout (its
    test_fixed_3d_rotate expectation): row-vector multiply by
    [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]]."""
    s = _sample3d(rng)
    pos0, y0 = s.pos.copy(), s.y.copy()
    feat0 = s.x[:, 0:3].copy()
    out = random_3d_rotate(
        s, rng, feature_indices=[(0, 3)], angles=(math.pi / 2, 0.0, 0.0)
    )
    m = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)
    np.testing.assert_allclose(out.pos, pos0 @ m, atol=1e-6)
    np.testing.assert_allclose(out.x[:, 0:3], feat0 @ m, atol=1e-6)
    np.testing.assert_allclose(out.y[:, 0:3], y0[:, 0:3] @ m, atol=1e-6)


def test_bezier_node_type_hook(rng):
    """``external.bezier.add_bezier_node_type`` (reference
    ``external/bezier.py:7-31``): node type from the one-hot boundary
    columns 3..7 — WALL iff bn=1 with all a_i=0, INFLOW iff a1=1, OUTFLOW
    iff a3=1 (a3 wins over a1 when both set), NORMAL otherwise — appended
    as a new last column."""
    from graphphysics_tpu.external.bezier import add_bezier_node_type

    x = np.zeros((6, 8), np.float32)
    x[:, 0:3] = rng.normal(size=(6, 3))
    x[1, 3] = 1.0  # bn only -> WALL
    x[2, 4] = 1.0  # a1 -> INFLOW
    x[3, 6] = 1.0  # a3 -> OUTFLOW
    x[4, 3] = 1.0
    x[4, 5] = 1.0  # bn with a2 set -> not wall -> NORMAL
    x[5, 4] = 1.0
    x[5, 6] = 1.0  # a1 and a3 -> OUTFLOW (a3 assigned last)
    s = RawSample(x=x, pos=rng.normal(size=(6, 2)).astype(np.float32))
    out = add_bezier_node_type(s, rng)
    assert out.x.shape == (6, 9)
    expected = [
        NodeType.NORMAL, NodeType.WALL_BOUNDARY, NodeType.INFLOW,
        NodeType.OUTFLOW, NodeType.NORMAL, NodeType.OUTFLOW,
    ]
    np.testing.assert_array_equal(out.x[:, 8], [float(t) for t in expected])
