"""Host-side mesh-topology construction (numpy / scipy).

Graph construction is inherently dynamic-shape, so in the TPU design it lives
entirely in the host input pipeline (per SURVEY.md §7.1): these functions
produce raw edge lists that the bucketing layer then pads to static shapes.
They re-implement the semantics of:

- PyG ``T.FaceToEdge`` + tetra->face expansion (reference
  ``graphphysics/utils/torch_graph.py:174-184``, ``jraphphysics/utils/jax_graph.py:86-128``)
- PyG ``T.Cartesian(norm=False) + T.Distance(norm=False)`` edge features
  (``graphphysics/dataset/preprocessing.py:16-23``)
- sparse k-hop adjacency powers (``torch_graph.py:16-53``) via scipy.sparse
- cKDTree world edges (``preprocessing.py:92-140``)
- PyG ``add_random_edge(force_undirected=True)`` (``dataset/dataset.py:104-137``)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.spatial import cKDTree


def to_undirected(
    senders: np.ndarray, receivers: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Union of both edge directions, deduplicated, sorted by (sender, receiver)."""
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    keep = s != r  # drop self loops like the reference k-hop path
    s, r = s[keep], r[keep]
    pairs = np.unique(np.stack([s, r], axis=1), axis=0)
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)


def face_to_edge(faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Triangles ``[F, 3]`` -> undirected deduplicated edge list.

    Matches PyG ``T.FaceToEdge``: each triangle contributes its three sides in
    both directions. Uses the native C++ kernel when available
    (``graphphysics_tpu.native``), numpy otherwise — identical output order.
    """
    faces = np.asarray(faces)
    if faces.shape[-1] != 3:
        raise ValueError(f"expected [F, 3] triangles, got {faces.shape}")
    if len(faces):
        from graphphysics_tpu.native import face_to_edge_native

        native = face_to_edge_native(faces, int(faces.max()) + 1)
        if native is not None:
            return native
    s = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 0]])
    r = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 2]])
    return to_undirected(s, r)


def tetra_to_faces(tetra: np.ndarray) -> np.ndarray:
    """Tetrahedra ``[T, 4]`` -> 4 triangle faces each, ``[4T, 3]``; ordering
    matches the reference expansion (``torch_graph.py:174-184``)."""
    t = np.asarray(tetra)
    if t.shape[-1] != 4:
        raise ValueError(f"expected [T, 4] tetrahedra, got {t.shape}")
    f0 = t[:, [0, 1, 2]]
    f1 = t[:, [1, 2, 3]]
    f2 = t[:, [2, 3, 0]]
    f3 = t[:, [3, 0, 1]]
    return np.concatenate([f0, f1, f2, f3], axis=0)


def tetra_boundary_faces(tetra: np.ndarray) -> np.ndarray:
    """Boundary surface of a tetrahedral mesh: the triangle faces that appear
    in exactly ONE tetrahedron, ``[B, 3]`` with original node ids (interior
    faces are shared by two cells and cancel). This is the surface the
    reference renders with PyVista's off-screen camera
    (``graphphysics/utils/pyvista_mesh.py:6-49``); we extract it host-side
    for the 3D matplotlib rendering in ``utils.visualization``."""
    faces = tetra_to_faces(tetra)  # [4T, 3]
    key = np.sort(faces, axis=1)
    _, idx, counts = np.unique(
        key, axis=0, return_index=True, return_counts=True
    )
    return faces[idx[counts == 1]]


def cells_to_edges(cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Triangle or tetra cells -> undirected mesh edge list."""
    cells = np.asarray(cells)
    if cells.shape[-1] == 4:
        cells = tetra_to_faces(cells)
    return face_to_edge(cells)


def cartesian_distance_features(
    pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    existing: Optional[np.ndarray] = None,
) -> np.ndarray:
    """``[E, D+1]`` edge features: relative position + L2 norm (the reference's
    ``T.Cartesian(norm=False) + T.Distance(norm=False)`` pair). PyG's layout is
    ``pos[row] - pos[col]`` with row=senders."""
    rel = pos[senders] - pos[receivers]
    dist = np.linalg.norm(rel, axis=-1, keepdims=True)
    feats = np.concatenate([rel, dist], axis=-1).astype(np.float32)
    if existing is not None:
        feats = np.concatenate([existing, feats], axis=-1).astype(np.float32)
    return feats


def world_pos_features(
    world_pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    existing: np.ndarray,
) -> np.ndarray:
    """Append relative world position + norm to existing edge features
    (reference ``add_world_pos_features``, ``preprocessing.py:143-174``)."""
    rel = world_pos[senders] - world_pos[receivers]
    nrm = np.linalg.norm(rel, axis=-1, keepdims=True)
    return np.concatenate([existing, rel, nrm], axis=-1).astype(np.float32)


def k_hop_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_hops: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Edges of the k-hop-augmented adjacency: reachable in <= k hops, no self
    loops. Semantics of the reference sparse-power loop (``torch_graph.py:16-53``:
    ``A_k = A_k + A_k @ A`` repeated, self-loops removed) on scipy sparse bool."""
    if num_hops <= 1:
        return senders.astype(np.int32), receivers.astype(np.int32)
    from graphphysics_tpu.native import k_hop_native

    native = k_hop_native(senders, receivers, num_nodes, num_hops)
    if native is not None:
        return native
    data = np.ones(len(senders), dtype=bool)
    adj = sp.coo_matrix(
        (data, (senders, receivers)), shape=(num_nodes, num_nodes)
    ).tocsr()
    acc = adj.copy()
    for _ in range(num_hops - 1):
        acc = (acc + acc @ adj).astype(bool)
        acc.setdiag(False)
        acc.eliminate_zeros()
    coo = acc.tocoo()
    pairs = np.unique(np.stack([coo.row, coo.col], axis=1), axis=0)
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)


def world_edges(
    world_pos: np.ndarray,
    node_type: np.ndarray,
    radius: float,
    obstacle_type: int,
    normal_type: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Radius-neighbor pairs between OBSTACLE and NORMAL nodes (reference
    ``add_world_edges``, ``preprocessing.py:92-140``): cKDTree ``query_pairs``
    filtered to cross-type pairs, returned as directed pairs (caller merges
    with mesh edges and symmetrizes)."""
    tree = cKDTree(np.asarray(world_pos))
    pairs = tree.query_pairs(radius, output_type="ndarray")  # [P, 2], i < j
    if len(pairs) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    t0 = node_type[pairs[:, 0]]
    t1 = node_type[pairs[:, 1]]
    keep = ((t0 == obstacle_type) & (t1 == normal_type)) | (
        (t0 == normal_type) & (t1 == obstacle_type)
    )
    pairs = pairs[keep]
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)


def add_random_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    ratio: float,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Add ``ratio * E`` random undirected edges (semantics of PyG
    ``add_random_edge(p, force_undirected=True)`` used at
    ``dataset/dataset.py:104-137``)."""
    if ratio <= 0.0 or ratio > 1.0:
        return senders, receivers
    num_new = int(round(ratio * len(senders) / 2))
    if num_new == 0:
        return senders, receivers
    s_new = rng.integers(0, num_nodes, size=num_new)
    r_new = rng.integers(0, num_nodes, size=num_new)
    keep = s_new != r_new
    s = np.concatenate([senders, s_new[keep], r_new[keep]])
    r = np.concatenate([receivers, r_new[keep], s_new[keep]])
    pairs = np.unique(np.stack([s, r], axis=1), axis=0)
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)


def min_distance_to_type(
    pos: np.ndarray, node_type: np.ndarray, target_type: int
) -> np.ndarray:
    """Per-node minimum distance to any node of ``target_type`` (reference
    ``compute_min_distance_to_type``, ``preprocessing.py:241-274``) — via
    cKDTree instead of the O(N^2) dense broadcast."""
    targets = pos[node_type == target_type]
    if len(targets) == 0:
        return np.full(len(pos), np.inf, np.float32)
    tree = cKDTree(targets)
    d, _ = tree.query(pos, k=1)
    return d.astype(np.float32)
