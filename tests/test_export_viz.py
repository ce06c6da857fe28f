"""Mesh export (VTU/XDMF) and visualization tests."""

import os

import numpy as np

from graphphysics_tpu.utils.mesh_export import (
    graph_to_meshdata,
    read_vtu,
    vtu_series_to_xdmf,
    write_vtu,
)
from graphphysics_tpu.utils.visualization import render_field_image
from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesReader
from tests.fixtures import triangulated_grid
from tests.conftest import make_test_graph


def test_vtu_roundtrip(tmp_path, rng):
    points, tris = triangulated_grid(6, 5)
    pd = {"v": rng.normal(size=(len(points),)), "vec": rng.normal(size=(len(points), 2))}
    p = str(tmp_path / "m.vtu")
    write_vtu(p, points, tris, pd)
    pts2, cells2, pd2 = read_vtu(p)
    np.testing.assert_allclose(pts2[:, :2], points, rtol=1e-6)
    np.testing.assert_array_equal(cells2, tris)
    np.testing.assert_allclose(pd2["v"], pd["v"], rtol=1e-6)
    np.testing.assert_allclose(pd2["vec"], pd["vec"], rtol=1e-6)


def test_graph_to_meshdata_unpads():
    g = make_test_graph()
    points, tris = triangulated_grid(8, 6)  # 48 = n real nodes
    pts, cells, pd = graph_to_meshdata(g, tris)
    assert len(pts) == 48
    assert "x0" in pd and "y0" in pd
    assert len(pd["x0"]) == 48


def test_vtu_series_to_xdmf(tmp_path, rng):
    points, tris = triangulated_grid(5, 4)
    paths = []
    for t in range(3):
        p = str(tmp_path / f"f{t}.vtu")
        write_vtu(p, points, tris, {"v": rng.normal(size=(len(points),))})
        paths.append(p)
    out = str(tmp_path / "series.xdmf")
    vtu_series_to_xdmf(paths, out, dt=0.5)
    with XdmfTimeSeriesReader(out) as r:
        assert r.num_steps == 3
        t, pd, _ = r.read_data(2)
        assert t == 1.0 and "v" in pd


def test_render_field_image(tmp_path, rng):
    points, tris = triangulated_grid(6, 5)
    p = render_field_image(
        points, tris, rng.normal(size=(len(points),)),
        str(tmp_path / "f.png"), title="t",
    )
    assert os.path.exists(p) and os.path.getsize(p) > 1000
