"""Native C++ host kernels: parity against the numpy reference paths."""

import numpy as np
import pytest

import graphphysics_tpu.native as native
from graphphysics_tpu.topology import build as B
from graphphysics_tpu.topology.ell import build_ell
from tests.fixtures import triangulated_grid


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native lib unavailable"
)


def _force_numpy():
    native._lib, native._tried = None, True


def _restore():
    native._lib, native._tried = None, False


@requires_native
def test_face_to_edge_parity(rng):
    _, tris = triangulated_grid(20, 15)
    s1, r1 = B.face_to_edge(tris)
    _force_numpy()
    try:
        s2, r2 = B.face_to_edge(tris)
    finally:
        _restore()
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(r1, r2)


@requires_native
def test_k_hop_parity():
    _, tris = triangulated_grid(12, 10)
    s, r = B.face_to_edge(tris)
    n = int(max(s.max(), r.max())) + 1
    k1 = B.k_hop_edges(s, r, n, 3)
    _force_numpy()
    try:
        k2 = B.k_hop_edges(s, r, n, 3)
    finally:
        _restore()
    np.testing.assert_array_equal(k1[0], k2[0])
    np.testing.assert_array_equal(k1[1], k2[1])


@requires_native
def test_build_ell_parity():
    _, tris = triangulated_grid(10, 8)
    s, r = B.face_to_edge(tris)
    n = int(max(s.max(), r.max())) + 1
    e1 = build_ell(s, r, n, degree=8)
    _force_numpy()
    try:
        e2 = build_ell(s, r, n, degree=8)
    finally:
        _restore()
    np.testing.assert_array_equal(e1.senders, e2.senders)
    np.testing.assert_array_equal(e1.edge_mask, e2.edge_mask)
    np.testing.assert_array_equal(e1.edge_perm, e2.edge_perm)
    np.testing.assert_array_equal(e1.twin_perm, e2.twin_perm)


@requires_native
def test_build_ell_native_error_codes():
    # degree overflow
    s = np.array([0, 1, 2, 1, 2, 0], np.int64)
    r = np.array([1, 0, 1, 2, 0, 2], np.int64)
    with pytest.raises(ValueError, match="exceeds"):
        build_ell(s, r, 3, degree=1)
    # asymmetry
    with pytest.raises(ValueError, match="not symmetric"):
        build_ell(np.array([0], np.int64), np.array([1], np.int64), 3, degree=4)
