"""Mesh export: graph -> VTU (XML) and VTU-series -> XDMF.

First-party replacement for the reference's meshio-based export
(``graphphysics/utils/meshio_mesh.py:10-113``): ``graph_to_vtu`` writes an
ASCII VTK UnstructuredGrid with node features as ``x{i}`` (and targets as
``y{i}``) point data, and ``vtu_series_to_xdmf`` compresses a VTU time series
into one XDMF + HDF5 pair (via ``utils.xdmf``).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from graphphysics_tpu.core.graph import Graph
from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesWriter

_VTK_CELL_TYPES = {"triangle": 5, "tetra": 10}


def graph_to_meshdata(
    graph: Graph,
    cells: np.ndarray,
    feature_names: Optional[Dict[str, int]] = None,
    add_targets: bool = True,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
    """Unpad a Graph back to (points, cells, point_data). ``cells`` come from
    the dataset (faces/tetra are host-side, not device arrays). Features are
    named ``x{i}`` / targets ``y{i}`` unless ``feature_names`` maps
    ``name -> column`` (reference ``convert_to_meshio_vtu`` semantics)."""
    node_mask = np.asarray(graph.node_mask)
    n = int(node_mask.sum())
    points = np.asarray(graph.pos)[:n]
    x = np.asarray(graph.x)[:n]
    point_data = {}
    if feature_names:
        for name, col in feature_names.items():
            point_data[name] = x[:, col]
    else:
        for i in range(x.shape[1]):
            point_data[f"x{i}"] = x[:, i]
        if add_targets and graph.y is not None:
            y = np.asarray(graph.y)[:n]
            for i in range(y.shape[1]):
                point_data[f"y{i}"] = y[:, i]
    return points, np.asarray(cells), point_data


def write_vtu(
    path: str,
    points: np.ndarray,
    cells: np.ndarray,
    point_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Minimal ASCII VTU (VTK XML UnstructuredGrid) writer — triangles or
    tetrahedra."""
    points = np.asarray(points, np.float64)
    cells = np.asarray(cells, np.int64)
    if points.shape[1] == 2:
        points = np.hstack([points, np.zeros((len(points), 1))])
    cell_type = {3: "triangle", 4: "tetra"}[cells.shape[1]]
    vtk_type = _VTK_CELL_TYPES[cell_type]

    root = ET.Element(
        "VTKFile", type="UnstructuredGrid", version="0.1", byte_order="LittleEndian"
    )
    ug = ET.SubElement(root, "UnstructuredGrid")
    piece = ET.SubElement(
        ug,
        "Piece",
        NumberOfPoints=str(len(points)),
        NumberOfCells=str(len(cells)),
    )

    def data_array(parent, name, arr, ncomp=None):
        arr = np.asarray(arr)
        da = ET.SubElement(
            parent,
            "DataArray",
            type="Float64" if arr.dtype.kind == "f" else "Int64",
            Name=name,
            Format="ascii",
        )
        if ncomp:
            da.set("NumberOfComponents", str(ncomp))
        da.text = " ".join(str(v) for v in arr.reshape(-1))
        return da

    pts = ET.SubElement(piece, "Points")
    data_array(pts, "Points", points, ncomp=3)
    cl = ET.SubElement(piece, "Cells")
    data_array(cl, "connectivity", cells)
    data_array(cl, "offsets", np.arange(1, len(cells) + 1) * cells.shape[1])
    types = ET.SubElement(
        cl, "DataArray", type="UInt8", Name="types", Format="ascii"
    )
    types.text = " ".join([str(vtk_type)] * len(cells))
    if point_data:
        pd = ET.SubElement(piece, "PointData")
        for name, arr in point_data.items():
            arr = np.asarray(arr)
            ncomp = arr.shape[1] if arr.ndim > 1 else None
            data_array(pd, name, arr, ncomp=ncomp)
    ET.indent(root)
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="utf-8")


def read_vtu(path: str):
    """Read back a VTU written by ``write_vtu`` (tests / round-trips)."""
    root = ET.parse(path).getroot()
    piece = root.find("UnstructuredGrid/Piece")
    pts = np.fromstring(
        piece.find("Points/DataArray").text, sep=" "
    ).reshape(-1, 3)
    conn = None
    for da in piece.findall("Cells/DataArray"):
        if da.get("Name") == "connectivity":
            conn = np.fromstring(da.text, sep=" ").astype(np.int64)
        if da.get("Name") == "offsets":
            offsets = np.fromstring(da.text, sep=" ").astype(np.int64)
    k = offsets[0]
    cells = conn.reshape(-1, k)
    point_data = {}
    pd = piece.find("PointData")
    if pd is not None:
        for da in pd.findall("DataArray"):
            arr = np.fromstring(da.text, sep=" ")
            ncomp = da.get("NumberOfComponents")
            if ncomp:
                arr = arr.reshape(-1, int(ncomp))
            point_data[da.get("Name")] = arr
    return pts, cells, point_data


def vtu_series_to_xdmf(
    vtu_paths: List[str], xdmf_path: str, dt: float = 1.0
) -> None:
    """Compress a VTU time series into one XDMF + HDF5 pair (reference
    ``vtu_to_xdmf``, ``meshio_mesh.py:69-113``)."""
    if not vtu_paths:
        raise ValueError("no VTU files given")
    points, cells, _ = read_vtu(vtu_paths[0])
    with XdmfTimeSeriesWriter(xdmf_path) as w:
        w.write_points_cells(points, cells)
        t = 0.0
        for p in vtu_paths:
            _, _, point_data = read_vtu(p)
            w.write_data(t, point_data)
            t += dt
