"""Synthetic dataset generators with the reference dataset schemas —
cylinder-flow-like h5 (CylinderFlow, ``dataset_config/cylinder_meta.json``),
deforming-plate-like h5 (world_pos + target_features), and aneurysm-like
xdmf with tetra cells. Used by the test suite, the examples, and the
benchmarks; also handy to smoke-test a training setup before pointing it
at real data."""

from __future__ import annotations

import json
import os

import h5py
import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesWriter


def triangulated_grid(nx: int, ny: int):
    """Structured triangle mesh on [0,1]^2: returns (points [N,2], tris [T,3])."""
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny), indexing="ij")
    points = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32)
    tris = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = i * ny + j + 1
            d = (i + 1) * ny + j + 1
            tris.append([a, b, c])
            tris.append([b, d, c])
    return points, np.array(tris, np.int32)


def tet_grid(n: int):
    """Structured tetra mesh on [0,1]^3 (5 tets per cube... simplified to 6)."""
    xs, ys, zs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    points = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.float32)
    tets = []
    def vid(i, j, k):
        return (i * n + j) * n + k
    for i in range(n - 1):
        for j in range(n - 1):
            for k in range(n - 1):
                v = [vid(i + a, j + b, k + c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
                # 6-tet decomposition of the cube
                for t in ([0, 1, 3, 7], [0, 1, 5, 7], [0, 4, 5, 7],
                          [0, 2, 3, 7], [0, 2, 6, 7], [0, 4, 6, 7]):
                    tets.append([v[t[0]], v[t[1]], v[t[2]], v[t[3]]])
    return points, np.array(tets, np.int32)


def cylinder_node_types(points: np.ndarray) -> np.ndarray:
    nt = np.full(len(points), int(NodeType.NORMAL), np.int32)
    nt[points[:, 0] == 0.0] = int(NodeType.INFLOW)
    nt[points[:, 0] == 1.0] = int(NodeType.OUTFLOW)
    nt[(points[:, 1] == 0.0) | (points[:, 1] == 1.0)] = int(NodeType.WALL_BOUNDARY)
    return nt


def synth_velocity(points: np.ndarray, t: float) -> np.ndarray:
    """A smooth, time-evolving 2D field (advecting vortex — learnable but
    nontrivial)."""
    x, y = points[:, 0], points[:, 1]
    u = np.sin(2 * np.pi * (x - 0.3 * t)) * np.cos(np.pi * y)
    v = 0.5 * np.cos(2 * np.pi * (x - 0.3 * t)) * np.sin(np.pi * y)
    return np.stack([u, v], axis=1).astype(np.float32)


def write_cylinder_h5(dirpath: str, num_traj=2, steps=12, nx=12, ny=8,
                      grids=None, seed=None):
    """CylinderFlow-schema h5 + meta.json; returns (h5_path, meta_path).
    ``grids``: optional per-trajectory ``(nx, ny)`` list for heterogeneous
    mesh sizes (the size-bucketing regime; the schema's ``-1`` node dims
    already allow it, like the real aneurysm/bezier datasets).
    ``seed``: when set, randomize per-trajectory wave phase (held-out
    validation splits); the default keeps the deterministic phase ramp."""
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed) if seed is not None else None
    grids = list(grids) if grids is not None else [(nx, ny)] * num_traj
    h5_path = os.path.join(dirpath, "train.h5")
    with h5py.File(h5_path, "w") as f:
        for tr, (gx, gy) in enumerate(grids):
            phase0 = 0.15 * tr if rng is None else float(rng.uniform(0.0, 3.0))
            points, tris = triangulated_grid(gx, gy)
            g = f.create_group(str(tr))
            g["cells"] = np.repeat(tris[None], steps, axis=0)
            g["mesh_pos"] = np.repeat(points[None], steps, axis=0)
            g["node_type"] = np.repeat(
                cylinder_node_types(points)[None, :, None], steps, axis=0
            )
            vel = np.stack(
                [synth_velocity(points, 0.05 * t + phase0) for t in range(steps)]
            )
            g["velocity"] = vel
    meta = {
        "dt": 0.01,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 2], "dtype": "float32"},
            "node_type": {"type": "static", "shape": [steps, -1, 1], "dtype": "int32"},
            "velocity": {"type": "dynamic", "shape": [steps, -1, 2], "dtype": "float32"},
        },
        "field_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "trajectory_length": steps,
    }
    meta_path = os.path.join(dirpath, "meta.json")
    with open(meta_path, "w") as fp:
        json.dump(meta, fp)
    return h5_path, meta_path


def write_panels_xdmf(dirpath: str, num_traj=2, steps=12, nx=12, ny=8,
                      seed=None):
    """Panels-schema xdmf folder (triangles, VitesseCoarse + NodeTypeCoarse;
    reference ``dataset_config/panels_meta.json``) + meta.json. Node types
    come as a STATIC int field in the data (panels.json reads them at
    ``node_type_index: 3`` directly — no external hook); a square interior
    panel of WALL nodes obstructs the flow. ``seed``: randomize
    per-trajectory wave phase/amplitude (held-out splits)."""
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed) if seed is not None else None
    for tr in range(num_traj):
        phase0 = 0.15 * tr if rng is None else float(rng.uniform(0.0, 1.0))
        amp = 1.0 if rng is None else float(rng.uniform(0.8, 1.2))
        points, tris = triangulated_grid(nx, ny)
        nt = cylinder_node_types(points)
        panel = (
            (np.abs(points[:, 0] - 0.4) < 0.12)
            & (np.abs(points[:, 1] - 0.5) < 0.15)
        )
        nt[panel] = int(NodeType.WALL_BOUNDARY)
        damp = (1.0 - (nt == int(NodeType.WALL_BOUNDARY)))[:, None]
        fn = os.path.join(dirpath, f"panel_{tr}.xdmf")
        with XdmfTimeSeriesWriter(fn) as w:
            w.write_points_cells(points.astype(np.float64), tris,
                                 cell_type="triangle")
            for t in range(steps):
                v2 = amp * synth_velocity(points, 0.05 * t + phase0)
                vit = np.concatenate(
                    [v2, np.zeros((len(points), 1), np.float32)], axis=1
                ) * damp
                w.write_data(
                    0.05 * t,
                    {"VitesseCoarse": vit.astype(np.float32),
                     "NodeTypeCoarse": nt.astype(np.int32)},
                )
    # feature dict order fixes the x layout: [Vitesse(3), NodeType(1),
    # time(1)] -> panels.json indices (features 0:2, node_type_index 3)
    meta = {
        "dt": 0.05,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 3],
                      "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 2],
                         "dtype": "float32"},
            "VitesseCoarse": {"type": "dynamic", "shape": [steps, -1, 3],
                              "dtype": "float32"},
            "NodeTypeCoarse": {"type": "static", "shape": [steps, -1, 1],
                               "dtype": "int32"},
        },
        "field_names": ["cells", "mesh_pos", "VitesseCoarse",
                        "NodeTypeCoarse"],
        "trajectory_length": steps,
    }
    meta_path = os.path.join(dirpath, "meta.json")
    with open(meta_path, "w") as fp:
        json.dump(meta, fp)
    return dirpath, meta_path


def write_plate_h5(dirpath: str, num_traj=1, steps=8, n=5):
    """DeformingPlate-schema h5 (3D tetra, world_pos dynamic, target_features)."""
    os.makedirs(dirpath, exist_ok=True)
    points, tets = tet_grid(n)
    nt = np.full(len(points), int(NodeType.NORMAL), np.int32)
    nt[points[:, 2] == 0.0] = int(NodeType.HANDLE)
    nt[points[:, 2] == 1.0] = int(NodeType.OBSTACLE)
    h5_path = os.path.join(dirpath, "train.h5")
    with h5py.File(h5_path, "w") as f:
        for tr in range(num_traj):
            g = f.create_group(str(tr))
            g["cells"] = np.repeat(tets[None], steps, axis=0)
            g["mesh_pos"] = np.repeat(points[None], steps, axis=0)
            g["node_type"] = np.repeat(nt[None, :, None], steps, axis=0)
            wp = np.stack(
                [
                    points + 0.02 * t * np.array([0, 0, 1], np.float32)
                    for t in range(steps)
                ]
            )
            g["world_pos"] = wp.astype(np.float32)
    meta = {
        "dt": 0,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 4], "dtype": "int32"},
            "node_type": {"type": "static", "shape": [steps, -1, 1], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 3], "dtype": "float32"},
            "world_pos": {"type": "dynamic", "shape": [steps, -1, 3], "dtype": "float32"},
        },
        "target_features": ["world_pos"],
        "field_names": ["cells", "node_type", "mesh_pos", "world_pos"],
        "trajectory_length": steps,
    }
    meta_path = os.path.join(dirpath, "meta.json")
    with open(meta_path, "w") as fp:
        json.dump(meta, fp)
    return h5_path, meta_path


def tet_box(nx: int, ny: int, nz: int, extent=(1.0, 1.0, 1.0)):
    """Structured tetra mesh on [0,ex]x[0,ey]x[0,ez] with independent
    per-axis resolution (``tet_grid`` generalized): returns
    (points [N,3] float32, tets [T,4] int32)."""
    ex, ey, ez = extent
    xs, ys, zs = np.meshgrid(
        np.linspace(0, ex, nx), np.linspace(0, ey, ny), np.linspace(0, ez, nz),
        indexing="ij",
    )
    points = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(
        np.float32
    )
    tets = []

    def vid(i, j, k):
        return (i * ny + j) * nz + k

    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                v = [
                    vid(i + a, j + b, k + c)
                    for a in (0, 1)
                    for b in (0, 1)
                    for c in (0, 1)
                ]
                for t in ([0, 1, 3, 7], [0, 1, 5, 7], [0, 4, 5, 7],
                          [0, 2, 3, 7], [0, 2, 6, 7], [0, 4, 6, 7]):
                    tets.append([v[t[0]], v[t[1]], v[t[2]], v[t[3]]])
    return points, np.array(tets, np.int32)


def write_plate_press_h5(
    dirpath: str,
    num_traj: int = 4,
    steps: int = 40,
    nx: int = 10,
    nz: int = 3,
    seed: int = 0,
):
    """DeformingPlate-like *press* dataset: a rigid punch (OBSTACLE nodes)
    descends into a deformable slab whose bottom face is fixed (HANDLE).
    The slab's world_pos deforms by a Gaussian indentation that grows with
    punch contact depth — nonlinear in time and spatially varying, so the
    one-step world_pos delta is only predictable from the obstacle's
    next-step displacement feature + world edges (the exact input pipeline
    of the reference's DeformingPlate task, ``preprocessing.py:49-174``).

    Punch center (cx, cy) and descent speed are randomized per trajectory.
    Same h5/meta schema as ``write_plate_h5`` (``target_features:
    ["world_pos"]``); use world-edge radius >= 0.08.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(dirpath, exist_ok=True)

    z_top = 0.2
    plate_pts, plate_tets = tet_box(nx, nx, nz, extent=(1.0, 1.0, z_top))
    punch_pts0, punch_tets = tet_box(3, 3, 2, extent=(0.16, 0.16, 0.05))

    n_plate = len(plate_pts)
    points = np.concatenate([plate_pts, punch_pts0], axis=0)
    tets = np.concatenate([plate_tets, punch_tets + n_plate], axis=0)

    nt = np.full(len(points), int(NodeType.NORMAL), np.int32)
    nt[: n_plate][plate_pts[:, 2] == 0.0] = int(NodeType.HANDLE)
    nt[n_plate:] = int(NodeType.OBSTACLE)

    h5_path = os.path.join(dirpath, "train.h5")
    sigma = 0.18
    with h5py.File(h5_path, "w") as f:
        for tr in range(num_traj):
            cx, cy = rng.uniform(0.3, 0.7, size=2)
            speed = rng.uniform(0.0025, 0.004)
            # punch starts just above the slab; contact begins 25% into the
            # trajectory regardless of its length
            z0 = z_top + 0.25 * speed * steps
            punch = punch_pts0 + np.array(
                [cx - 0.08, cy - 0.08, z0], np.float32
            )
            r2 = (plate_pts[:, 0] - cx) ** 2 + (plate_pts[:, 1] - cy) ** 2
            bump = np.exp(-r2 / (2 * sigma**2)) * (plate_pts[:, 2] / z_top)

            frames = []
            for t in range(steps):
                descent = speed * t
                depth = max(0.0, descent - (z0 - z_top))  # contact depth
                wp = np.concatenate(
                    [
                        plate_pts
                        - np.outer(depth * bump, np.array([0, 0, 1.0])),
                        punch - np.array([0, 0, descent]),
                    ],
                    axis=0,
                )
                frames.append(wp.astype(np.float32))

            g = f.create_group(str(tr))
            g["cells"] = np.repeat(tets[None], steps, axis=0)
            g["mesh_pos"] = np.repeat(points[None], steps, axis=0)
            g["node_type"] = np.repeat(nt[None, :, None], steps, axis=0)
            g["world_pos"] = np.stack(frames)

    meta = {
        "dt": 0,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 4], "dtype": "int32"},
            "node_type": {"type": "static", "shape": [steps, -1, 1], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 3], "dtype": "float32"},
            "world_pos": {"type": "dynamic", "shape": [steps, -1, 3], "dtype": "float32"},
        },
        "target_features": ["world_pos"],
        "field_names": ["cells", "node_type", "mesh_pos", "world_pos"],
        "trajectory_length": steps,
    }
    meta_path = os.path.join(dirpath, "meta.json")
    with open(meta_path, "w") as fp:
        json.dump(meta, fp)
    return h5_path, meta_path


def write_aneurysm_xdmf(dirpath: str, num_traj=2, steps=9, n=4, sizes=None,
                        seed=None):
    """Aneurysm-schema xdmf folder (tetra, Vitesse + wall_mask) + meta.json.
    ``sizes``: optional per-trajectory tet-grid resolution list for
    heterogeneous mesh sizes (the size-bucketing regime).
    ``seed``: when set, randomize per-trajectory wave phase and amplitudes
    (distinct initial conditions — for held-out validation splits); the
    default keeps the original deterministic phase ramp."""
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed) if seed is not None else None
    sizes = list(sizes) if sizes is not None else [n] * num_traj
    for tr, nn in enumerate(sizes):
        phase0 = 0.1 * tr if rng is None else float(rng.uniform(0.0, 1.0))
        amp = (
            np.array([1.0, 0.3, 0.1], np.float32)
            if rng is None
            else np.array([1.0, 0.3, 0.1], np.float32)
            * rng.uniform(0.8, 1.2, size=3).astype(np.float32)
        )
        points, tets = tet_grid(nn)
        # shift so the inflow/outflow plane y == 0 exists and x spans +-0.5
        points = points - np.array([0.5, 0.0, 0.0], np.float32)
        wall = (
            (points[:, 0] == points[:, 0].min())
            | (points[:, 0] == points[:, 0].max())
            | (points[:, 2] == points[:, 2].min())
            | (points[:, 2] == points[:, 2].max())
        ).astype(np.float32)
        fn = os.path.join(dirpath, f"mesh_{tr}.xdmf")
        with XdmfTimeSeriesWriter(fn) as w:
            w.write_points_cells(points.astype(np.float64), tets, cell_type="tetra")
            for t in range(steps):
                phase = 0.05 * t + phase0
                vit = np.stack(
                    [
                        amp[0] * np.sin(2 * np.pi * (points[:, 0] - phase)),
                        amp[1] * np.cos(2 * np.pi * (points[:, 1] - phase)),
                        amp[2] * np.sin(2 * np.pi * (points[:, 2] + phase)),
                    ],
                    axis=1,
                ).astype(np.float32) * (1.0 - wall[:, None])
                w.write_data(0.01 * t, {"Vitesse": vit, "wall_mask": wall})
    meta = {
        "dt": 0.01,
        "features": {
            "cells": {"type": "static", "shape": [steps, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [steps, -1, 3], "dtype": "float32"},
            "Vitesse": {"type": "dynamic", "shape": [steps, -1, 3], "dtype": "float32"},
            "wall_mask": {"type": "static", "shape": [steps, -1, 1], "dtype": "float32"},
        },
        "field_names": ["cells", "mesh_pos", "Vitesse", "wall_mask"],
        "trajectory_length": steps,
    }
    meta_path = os.path.join(dirpath, "meta.json")
    with open(meta_path, "w") as fp:
        json.dump(meta, fp)
    return dirpath, meta_path
