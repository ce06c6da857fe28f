"""H5 trajectory dataset (reference ``graphphysics/dataset/h5_dataset.py``).

Design deltas from the reference:

- whole trajectories are cached in memory (small LRU) instead of re-read from
  disk for every frame (the reference re-reads the full trajectory per item,
  ``h5_dataset.py:85-87``);
- the file handle is opened lazily per process, so the dataset object can be
  pickled into worker processes safely (the reference forces
  ``num_workers=0`` for h5, ``parse_parameters.py:224-225``).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Optional

import h5py
import numpy as np

from graphphysics_tpu.dataset.dataset import BaseDataset
from graphphysics_tpu.dataset.sample import RawSample, meshdata_to_sample


def load_meta_trajectory(
    file_handle: h5py.File, traj_key: str, meta: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Read all features of one trajectory, reshaped per the meta schema
    (reference ``get_traj_as_meshes``, ``hierarchical.py:38-64``)."""
    group = file_handle[traj_key]
    out = {}
    for key, field in meta["features"].items():
        data = group[key][()].astype(field["dtype"])
        shape = list(field["shape"])
        # a meta may leave BOTH the time and node axes inferred (-1);
        # numpy reshape takes only one unknown, so resolve the time axis
        # from the meta's trajectory_length (same rule scan_node_counts
        # uses for these layouts)
        if sum(1 for s in shape if not s or s < 0) > 1:
            t = meta.get("trajectory_length")
            if t and shape[0] in (-1, None, 0):
                shape[0] = int(t)
        out[key] = data.reshape(shape)
    return out


def frame_to_sample(
    traj: Dict[str, np.ndarray],
    frame: int,
    meta: Dict[str, Any],
    frame_target: Optional[int] = None,
    id: Optional[str] = None,
) -> RawSample:
    """One frame -> RawSample (reference ``get_frame_as_mesh`` +
    ``get_frame_as_graph``, ``hierarchical.py:67-155``): node features are all
    non-geometry fields at ``frame`` plus node_type (frame 0) plus a trailing
    time column; targets are the dynamic fields (or ``meta.target_features``)
    at ``frame_target``."""
    feats = meta["features"]

    def at_frame(key: str, fr: int) -> np.ndarray:
        """Frame slice honoring the meta's static/dynamic typing: a static
        field stored WITHOUT the time axis ([N, k], ndim 2) is used as-is —
        indexing it by frame would pick node ``fr``'s row; a tiled static
        field reads frame 0 (identical content, exact index)."""
        a = traj[key]
        if feats.get(key, {}).get("type") == "static":
            return a[0] if a.ndim > 2 else a
        return a[fr]

    target_point_data = None
    if frame_target is not None:
        names = meta.get("target_features")
        if names is None:
            target_point_data = {
                key: traj[key][frame_target]
                for key, field in feats.items()
                if field["type"] == "dynamic"
            }
        else:
            target_point_data = {
                key: at_frame(key, frame_target) for key in names
            }

    point_data = {
        key: at_frame(key, frame)
        for key in traj.keys()
        if key not in ("mesh_pos", "cells", "node_type")
    }
    if "node_type" in traj:
        nt = traj["node_type"]
        static_untiled = (
            feats.get("node_type", {}).get("type") == "static"
            and nt.ndim == 2
        )
        point_data["node_type"] = nt if static_untiled else nt[0]

    # per-frame arrays are [T, N, k] after the meta reshape; a static array
    # stored without the time axis ([N, k], ndim 2) is used as-is
    mesh_pos = traj["mesh_pos"][frame] if traj["mesh_pos"].ndim > 2 else traj["mesh_pos"]
    cells = traj["cells"][frame] if traj["cells"].ndim > 2 else traj["cells"]

    time = frame * meta.get("dt", 1)
    return meshdata_to_sample(
        points=mesh_pos,
        cells=cells,
        point_data=point_data,
        time=time,
        target=target_point_data,
        id=id,
    )


class H5Dataset(BaseDataset):
    def __init__(
        self,
        h5_path: str,
        meta_path: str,
        switch_to_val: bool = False,
        traj_cache_size: int = 2,
        **kwargs,
    ):
        super().__init__(meta_path=meta_path, **kwargs)
        if switch_to_val:
            # LAST occurrence only: the reference's whole-path replace
            # (h5_dataset.py:40-41) corrupts paths where "train" is a
            # substring of an unrelated component ("constrained_runs/...")
            i = h5_path.rfind("train")
            if i >= 0:
                h5_path = h5_path[:i] + "test" + h5_path[i + 5 :]
        self.h5_path = h5_path
        self.dt = self.meta.get("dt", 1) or 1

        self._file: Optional[h5py.File] = None
        self._traj_cache: OrderedDict = OrderedDict()
        self._traj_cache_size = traj_cache_size
        with h5py.File(h5_path, "r") as f:
            self.datasets_index = list(f.keys())
        self._size_dataset = len(self.datasets_index)

    @property
    def size_dataset(self) -> int:
        return self._size_dataset

    def _handle(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.h5_path, "r")
        return self._file

    def _trajectory(self, traj_index: int) -> Dict[str, np.ndarray]:
        if traj_index in self._traj_cache:
            self._traj_cache.move_to_end(traj_index)
            return self._traj_cache[traj_index]
        traj = load_meta_trajectory(
            self._handle(), self.datasets_index[traj_index], self.meta
        )
        self._traj_cache[traj_index] = traj
        while len(self._traj_cache) > self._traj_cache_size:
            self._traj_cache.popitem(last=False)
        return traj

    def scan_node_counts(self):
        f = self._handle()
        shape_meta = self.meta["features"]["mesh_pos"]["shape"]
        d = shape_meta[-1]
        counts = []
        for key in self.datasets_index:
            arr = f[key]["mesh_pos"]
            # stored with the meta's own rank ([T, N, d], or static [N, d]
            # without a time axis) -> N directly
            if arr.ndim == len(shape_meta) and arr.ndim >= 2 and arr.shape[-1] == d:
                n = arr.shape[-2]
            elif len(shape_meta) == 2:
                # static mesh_pos stored flat: element count / d
                n = int(np.prod(arr.shape)) // d
            else:
                # flat dynamic layout ([T*N, d] or 1D): element count /
                # (T * d); the meta time axis may be -1 (inferred), so fall
                # back to trajectory_length
                t = (
                    shape_meta[0]
                    if shape_meta[0] and shape_meta[0] > 0
                    else self.trajectory_length
                )
                n = int(np.prod(arr.shape)) // (t * d)
            counts.append(int(n))
        return counts

    def _load(self, index: int) -> RawSample:
        traj_index, frame = self.get_traj_frame(index)
        traj = self._trajectory(traj_index)
        sample = frame_to_sample(
            traj, frame, self.meta, frame_target=frame + 1
        )
        if self.use_previous_data:
            prev = frame_to_sample(traj, frame - 1, self.meta, frame_target=None)
            sample.previous_data = prev.x
        sample.traj_index = traj_index
        return sample

    def reset_process_state(self):
        """Drop the open h5 handle + trajectory cache. Called in fresh
        loader worker processes (``loader._worker_main``) so each process
        opens its own HDF5 handle — sharing one OS file description across
        processes corrupts HDF5 reads."""
        self._file = None
        self._traj_cache = OrderedDict()

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_file"] = None  # handles are not picklable; reopen per process
        state["_traj_cache"] = OrderedDict()
        return state

    def __del__(self):
        try:
            if getattr(self, "_file", None) is not None:
                self._file.close()
        except Exception:
            pass  # interpreter shutdown: h5py internals may already be gone
