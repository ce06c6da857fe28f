"""Host-side raw sample container and mesh->sample conversion.

``RawSample`` is the mutable numpy staging object that the preprocessing
pipeline transforms before padding to a static ``core.graph.Graph`` — the
TPU-design replacement for the reference's PyG ``Data`` staging
(``graphphysics/utils/torch_graph.py:115-195``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Union

import numpy as np

from graphphysics_tpu.topology import tetra_to_faces


@dataclasses.dataclass
class RawSample:
    """A single dynamic-shape frame graph under construction (host, numpy)."""

    x: np.ndarray  # [N, F] node features
    pos: np.ndarray  # [N, D]
    faces: Optional[np.ndarray] = None  # [F, 3] triangles
    tetra: Optional[np.ndarray] = None  # [T, 4]
    senders: Optional[np.ndarray] = None  # [E]
    receivers: Optional[np.ndarray] = None
    edge_attr: Optional[np.ndarray] = None  # [E, Fe]
    y: Optional[np.ndarray] = None  # [N, Fo]
    previous_data: Optional[Any] = None  # h5: [N, F] prev frame x; xdmf: dict
    traj_index: int = 0
    id: Optional[str] = None
    target_dt: Optional[float] = None
    previous_dt: Optional[float] = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return 0 if self.senders is None else self.senders.shape[0]


def _stack_point_data(
    point_data: Dict[str, np.ndarray], num_points: int, time: Union[int, float]
) -> np.ndarray:
    """hstack point-data fields + trailing time column (reference
    ``meshdata_to_graph``, ``torch_graph.py:138-153``)."""
    cols = []
    for data in point_data.values():
        a = np.asarray(data)
        cols.append(a.reshape(num_points, -1))
    cols.append(np.full((num_points, 1), time))
    return np.hstack(cols).astype(np.float32)


def meshdata_to_sample(
    points: np.ndarray,
    cells: np.ndarray,
    point_data: Optional[Dict[str, np.ndarray]],
    time: Union[int, float] = 1,
    target: Optional[Dict[str, np.ndarray]] = None,
    id: Optional[str] = None,
) -> RawSample:
    """Build a RawSample from mesh arrays; tetra cells are expanded to
    triangle faces and kept (``torch_graph.py:170-195`` semantics)."""
    points = np.asarray(points)
    n = len(points)
    if point_data is not None:
        x = _stack_point_data(point_data, n, time)
    else:
        x = np.zeros((n, 1), np.float32)

    y = None
    if target is not None:
        y = np.hstack(
            [np.asarray(v).reshape(n, -1) for v in target.values()]
        ).astype(np.float32)

    cells = np.asarray(cells)
    if cells.ndim != 2:
        raise ValueError(f"cells must be 2D, got {cells.shape}")
    tetra = None
    if cells.shape[-1] == 4:
        tetra = cells
        faces = tetra_to_faces(cells)
    elif cells.shape[-1] == 3:
        faces = cells
    else:
        raise ValueError(f"cells must be triangles or tetrahedra, got {cells.shape}")

    return RawSample(
        x=x,
        pos=points.astype(np.float32),
        faces=faces.astype(np.int64),
        tetra=None if tetra is None else tetra.astype(np.int64),
        y=y,
        id=id,
    )
