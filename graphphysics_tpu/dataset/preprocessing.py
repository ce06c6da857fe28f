"""Host-side preprocessing pipeline (numpy), matching the reference semantics.

Re-implements ``graphphysics/dataset/preprocessing.py`` on ``RawSample``:
the pipeline order, the noise masking on non-NORMAL nodes, the world-edge
construction for DeformingPlate, and the pluggable extra node/edge feature
hooks. Randomness is threaded through an explicit ``numpy.random.Generator``
(the host analog of the PRNG-key threading the device code uses).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.dataset.sample import RawSample
from graphphysics_tpu.topology import (
    cartesian_distance_features,
    face_to_edge,
    to_undirected,
    world_edges,
    world_pos_features,
)

# A transform takes (sample, rng) and mutates/returns the sample.
Transform = Callable[[RawSample, np.random.Generator], RawSample]


def apply_face_to_edge(sample: RawSample, rng: np.random.Generator) -> RawSample:
    """PyG ``T.FaceToEdge(remove_faces=False)`` analog."""
    s, r = face_to_edge(sample.faces)
    sample.senders, sample.receivers = s, r
    return sample


def add_edge_features(sample: RawSample, rng: np.random.Generator) -> RawSample:
    """``T.Cartesian(norm=False) + T.Distance(norm=False)``
    (``preprocessing.py:16-23``): relative mesh position + L2 norm."""
    sample.edge_attr = cartesian_distance_features(
        sample.pos, sample.senders, sample.receivers, existing=sample.edge_attr
    )
    return sample


def add_noise(
    sample: RawSample,
    rng: np.random.Generator,
    noise_index_start: Union[int, Sequence[int]],
    noise_index_end: Union[int, Sequence[int]],
    noise_scale: Union[float, Sequence[float]],
    node_type_index: int,
    t: Optional[float] = None,
) -> RawSample:
    """Gaussian training noise on feature slices, zeroed for non-NORMAL nodes;
    optional cosine curriculum ``10*std*(1+cos(t*pi))``
    (reference ``add_noise``, ``preprocessing.py:177-238``)."""
    starts = [noise_index_start] if isinstance(noise_index_start, int) else list(noise_index_start)
    ends = [noise_index_end] if isinstance(noise_index_end, int) else list(noise_index_end)
    scales = (
        [noise_scale] * len(starts)
        if isinstance(noise_scale, (int, float))
        else list(noise_scale)
    )
    if len(starts) != len(ends) or len(scales) != len(starts):
        raise ValueError("noise index/scale lists must have equal length")

    non_normal = sample.x[:, node_type_index] != NodeType.NORMAL
    for start, end, scale in zip(starts, ends, scales):
        scale_ = 10 * scale * (1 + math.cos(t * math.pi)) if t is not None else scale
        noise = rng.normal(size=sample.x[:, start:end].shape).astype(
            sample.x.dtype
        ) * scale_
        noise[non_normal] = 0
        sample.x[:, start:end] += noise
    return sample


def add_obstacles_next_pos(
    sample: RawSample,
    rng: np.random.Generator,
    world_pos_index_start: int,
    world_pos_index_end: int,
    node_type_index: int,
) -> RawSample:
    """Insert the obstacles' next-step displacement as an input feature
    (DeformingPlate pipeline, reference ``preprocessing.py:49-89``). The given
    ``node_type_index`` is the index AFTER insertion, so it is shifted back by
    the inserted width (the reference hardcodes ``- 3`` for its 3D plate,
    ``preprocessing.py:78-81``; this generalizes to any world-pos width)."""
    wps, wpe = world_pos_index_start, world_pos_index_end
    prefix = sample.x[:, :wps]  # columns before world_pos survive verbatim
    world_pos = sample.x[:, wps:wpe]
    other = sample.x[:, wpe:]
    target_world_pos = sample.y[:, wps:wpe]
    displacement = target_world_pos - world_pos

    # displacement is inserted at column wpe, so a post-insertion index i
    # maps to pre-insertion i when i < wpe and i - width after it
    w = wpe - wps
    nt_pre = node_type_index if node_type_index < wpe else node_type_index - w
    node_type = sample.x[:, nt_pre]
    obstacle = node_type == NodeType.OBSTACLE
    mean_disp = displacement[obstacle].mean(axis=0) if obstacle.any() else 0.0
    displacement = np.where(obstacle[:, None], displacement, mean_disp)

    sample.x = np.concatenate(
        [prefix, world_pos, displacement, other], axis=1
    ).astype(np.float32)
    return sample


def add_world_edges(
    sample: RawSample,
    rng: np.random.Generator,
    world_pos_index_start: int,
    world_pos_index_end: int,
    node_type_index: int,
    radius: float = 0.03,
) -> RawSample:
    """Add OBSTACLE<->NORMAL proximity edges in world space and symmetrize
    (reference ``add_world_edges``, ``preprocessing.py:92-140``)."""
    world_pos = sample.x[:, world_pos_index_start:world_pos_index_end]
    node_type = sample.x[:, node_type_index]
    ws, wr = world_edges(
        world_pos,
        node_type,
        radius,
        obstacle_type=int(NodeType.OBSTACLE),
        normal_type=int(NodeType.NORMAL),
    )
    s = np.concatenate([ws, sample.senders])
    r = np.concatenate([wr, sample.receivers])
    sample.senders, sample.receivers = to_undirected(s, r)
    return sample


def add_world_pos_features(
    sample: RawSample,
    rng: np.random.Generator,
    world_pos_index_start: int,
    world_pos_index_end: int,
) -> RawSample:
    """Append relative world position + norm to edge_attr
    (``preprocessing.py:143-174``)."""
    world_pos = sample.x[:, world_pos_index_start:world_pos_index_end]
    sample.edge_attr = world_pos_features(
        world_pos, sample.senders, sample.receivers, sample.edge_attr
    )
    return sample


def random_3d_rotate(
    sample: RawSample,
    rng: np.random.Generator,
    feature_indices: Optional[List[Tuple[int, int]]] = None,
    angles: Optional[Tuple[float, float, float]] = None,
) -> RawSample:
    """Random 3D rotation augmentation of pos, selected xyz feature slices,
    and the first 3 target columns (reference ``Random3DRotate``,
    ``preprocessing.py:277-366``, including its rotation-matrix convention).
    ``angles`` (alpha, beta, gamma) pins the rotation (deterministic
    augmentation / tests — the analog of the reference's monkey-patched
    ``_get_random_angles``)."""
    feature_indices = feature_indices or []
    for s, e in feature_indices:
        if e - s != 3:
            raise ValueError("each rotated feature range must span 3 columns")
    alpha, beta, gamma = (
        angles if angles is not None else rng.uniform(-math.pi, math.pi, size=3)
    )
    ca, sa = math.cos(alpha), math.sin(alpha)
    cb, sb = math.cos(beta), math.sin(beta)
    cg, sg = math.cos(gamma), math.sin(gamma)
    m = np.array(
        [
            [ca * cb, ca * sb * sg + sa * cg, -ca * sb * cg + sa * sg],
            [-sa * cb, -sa * sb * sg + ca * cg, sa * sb * cg + ca * sg],
            [sb, -cb * sg, cb * cg],
        ],
        np.float32,
    )
    if sample.pos is not None:
        if sample.pos.shape[-1] != 3:
            raise ValueError("positions must be 3D for Random3DRotate")
        sample.pos = sample.pos @ m
    for s, e in feature_indices:
        sample.x[:, s:e] = sample.x[:, s:e] @ m
    if sample.y is not None:
        if sample.y.shape[-1] < 3:
            # [N,<3] @ [3,3] would raise an opaque matmul shape error
            raise ValueError(
                f"Random3DRotate rotates the first 3 target columns; y "
                f"has only {sample.y.shape[-1]} — use it with 3D vector "
                f"targets"
            )
        sample.y[:, 0:3] = sample.y[:, 0:3] @ m
    return sample


def build_preprocessing(
    noise_parameters: Optional[dict] = None,
    world_pos_parameters: Optional[dict] = None,
    add_edges_features: bool = True,
    extra_node_features: Optional[Union[Transform, List[Transform]]] = None,
    extra_edge_features: Optional[Union[Transform, List[Transform]]] = None,
) -> Transform:
    """Compose the preprocessing pipeline with the reference's exact ordering
    (``build_preprocessing``, ``preprocessing.py:369-450``): extra node
    features first, world-pos pipeline or plain FaceToEdge(+edge features),
    noise inserted at position 1, extra edge features last."""
    steps: List[Transform] = []

    if extra_node_features is not None:
        if not isinstance(extra_node_features, list):
            extra_node_features = [extra_node_features]
        steps.extend(extra_node_features)

    if world_pos_parameters is not None:
        wps = world_pos_parameters["world_pos_index_start"]
        wpe = world_pos_parameters["world_pos_index_end"]
        nti = world_pos_parameters["node_type_index"]
        steps.extend(
            [
                partial(
                    add_obstacles_next_pos,
                    world_pos_index_start=wps,
                    world_pos_index_end=wpe,
                    node_type_index=nti,
                ),
                apply_face_to_edge,
                partial(
                    add_world_edges,
                    world_pos_index_start=wps,
                    world_pos_index_end=wpe,
                    node_type_index=nti,
                    radius=world_pos_parameters.get("radius", 0.03),
                ),
                add_edge_features,
                partial(
                    add_world_pos_features,
                    world_pos_index_start=wps,
                    world_pos_index_end=wpe,
                ),
            ]
        )
    else:
        steps.append(apply_face_to_edge)
        if add_edges_features:
            steps.append(add_edge_features)

    if noise_parameters is not None:
        steps.insert(
            1,
            partial(
                add_noise,
                noise_index_start=noise_parameters["noise_index_start"],
                noise_index_end=noise_parameters["noise_index_end"],
                noise_scale=noise_parameters["noise_scale"],
                node_type_index=noise_parameters["node_type_index"],
            ),
        )

    if extra_edge_features is not None:
        if not isinstance(extra_edge_features, list):
            extra_edge_features = [extra_edge_features]
        steps.extend(extra_edge_features)

    return Pipeline(steps)


class Pipeline:
    """Picklable composition of transforms (partials over module-level
    functions), so datasets holding a pipeline can cross process boundaries
    (GraphLoader worker processes) under any multiprocessing start method."""

    def __init__(self, steps: List[Transform]):
        self.steps = steps

    def __call__(
        self, sample: RawSample, rng: np.random.Generator
    ) -> RawSample:
        for step in self.steps:
            sample = step(sample, rng)
        return sample
