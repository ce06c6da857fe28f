"""XDMF time-series dataset (reference ``graphphysics/dataset/xdmf_dataset.py``),
reading through the first-party ``utils.xdmf`` reader.

Supports the reference's randomized multi-step-dt training: the target frame
is ``frame + U[1, random_next]`` and the previous frame ``frame - U[1,
random_prev]``, both reset to 1 in validation mode
(``xdmf_dataset.py:27-28,49-52,89-100``); the offsets scale the sample's
``target_dt`` / ``previous_dt`` annotations. Like the reference, those
annotations are not consumed by the model by default (the reference leaves
"add target_dt and previous_dt as features per node" as a TODO,
``xdmf_dataset.py:158``); ``dt_features=True`` implements that TODO — the
dts are appended as trailing node-feature columns so the model can condition
on the prediction horizon (set ``feature_index_end`` to cover them).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from graphphysics_tpu.dataset.dataset import BaseDataset
from graphphysics_tpu.dataset.sample import RawSample, meshdata_to_sample
from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesReader


class XDMFDataset(BaseDataset):
    def __init__(
        self,
        xdmf_folder: str,
        meta_path: str,
        switch_to_val: bool = False,
        random_prev: int = 1,
        random_next: int = 1,
        dt_features: bool = False,
        **kwargs,
    ):
        super().__init__(meta_path=meta_path, **kwargs)
        self.dt = self.meta.get("dt", 1) or 1
        self.random_next = random_next
        self.random_prev = random_prev
        self.dt_features = dt_features
        if switch_to_val:
            # LAST occurrence only (see h5_dataset: replace-all corrupts
            # paths with "train" inside an unrelated component)
            i = xdmf_folder.rfind("train")
            if i >= 0:
                xdmf_folder = (
                    xdmf_folder[:i] + "test" + xdmf_folder[i + 5 :]
                )
            self.random_next = 1
            self.random_prev = 1
        self.xdmf_folder = xdmf_folder
        self.file_paths: List[str] = sorted(
            os.path.join(xdmf_folder, f)
            for f in os.listdir(xdmf_folder)
            if os.path.isfile(os.path.join(xdmf_folder, f)) and f.endswith(".xdmf")
        )
        self._size_dataset = len(self.file_paths)

    @property
    def size_dataset(self) -> int:
        return self._size_dataset

    def scan_node_counts(self):
        # metadata-only: the Geometry DataItem's Dimensions attribute gives
        # the node count without touching the heavy arrays (gigabytes on
        # hundred-trajectory datasets)
        counts = []
        for path in self.file_paths:
            with XdmfTimeSeriesReader(path) as r:
                counts.append(r.num_points())
        return counts

    def _filter_features(
        self, point_data: Dict[str, np.ndarray], dynamic_only: bool = False
    ) -> Dict[str, np.ndarray]:
        out = {}
        for k, field in self.meta["features"].items():
            if dynamic_only and field["type"] != "dynamic":
                continue
            if k not in point_data:
                if field["type"] == "dynamic":
                    # a missing physics field would silently shift every
                    # subsequent x column: node_type_index/feature slices
                    # then read the WRONG columns — fail at the cause
                    # (the reference's meshio point-data indexing raises
                    # KeyError here too). Structural meta entries (cells,
                    # mesh_pos) legitimately ride in the grid topology,
                    # not the point data — those skip.
                    raise KeyError(
                        f"dynamic meta feature {k!r} missing from the "
                        f"grid's point data (has: {sorted(point_data)})"
                    )
                continue
            v = np.asarray(point_data[k]).astype(field["dtype"])
            if v.ndim == 1:
                v = v.reshape(-1, 1)
            out[k] = v
        return out

    def _load(self, index: int) -> RawSample:
        traj_index, frame = self.get_traj_frame(index)
        xdmf_file = self.file_paths[traj_index]
        mesh_id = os.path.splitext(os.path.basename(xdmf_file))[0].rsplit("_", 1)[-1]

        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, index, 7])
        )
        target_off = int(rng.integers(1, self.random_next + 1))
        prev_off = int(rng.integers(1, self.random_prev + 1))

        with XdmfTimeSeriesReader(xdmf_file) as reader:
            num_steps = reader.num_steps
            if frame - prev_off < 0:
                prev_off = 1
            if frame + target_off > num_steps - 1:
                target_off = 1
            if frame >= num_steps - 1:
                raise IndexError(
                    f"frame {frame} out of bounds for trajectory {traj_index} "
                    f"({num_steps} steps)"
                )
            points, cell_blocks = reader.read_points_cells()
            time, point_data, _ = reader.read_data(frame)
            _, target_point_data, _ = reader.read_data(frame + target_off)
            previous_data: Optional[Dict[str, np.ndarray]] = None
            if self.use_previous_data:
                _, prev_data, _ = reader.read_data(frame - prev_off)
                previous_data = self._filter_features(prev_data, dynamic_only=True)

        cells = cell_blocks[0][1]
        sample = meshdata_to_sample(
            points=points.astype(np.float32),
            cells=cells,
            point_data=self._filter_features(point_data),
            time=time,
            target=self._filter_features(target_point_data, dynamic_only=True),
            id=mesh_id,
        )
        sample.target_dt = target_off * self.dt
        if previous_data is not None:
            sample.previous_data = previous_data
            sample.previous_dt = -prev_off * self.dt
        if self.dt_features:
            # the reference's TODO (xdmf_dataset.py:158): horizon dts as
            # TRAILING node-feature columns (existing positional indices —
            # node_type_index, feature slices, the time column — stay valid)
            n = sample.x.shape[0]
            cols = [np.full((n, 1), sample.target_dt, np.float32)]
            if previous_data is not None:
                cols.append(np.full((n, 1), sample.previous_dt, np.float32))
            sample.x = np.concatenate([sample.x] + cols, axis=1)
        sample.traj_index = traj_index
        return sample
