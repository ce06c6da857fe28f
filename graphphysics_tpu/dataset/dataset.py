"""Base dataset: index math, k-hop cache, random edges, masking, padding.

Host-side re-design of the reference ``graphphysics/dataset/dataset.py`` with
one structural addition: every item is padded to static node/edge *budgets*
(rounded to a hardware-friendly multiple) so the device side compiles once.
Budgets are given explicitly or derived from the node-count scan plus a
CANONICAL sample (item 0 at a fixed seed) with headroom — canonical, not
"first item processed", so independent processes/hosts derive identical
static shapes.
"""

from __future__ import annotations

import abc
import json
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from graphphysics_tpu.core.graph import Graph, pad_graph_np, round_up
from graphphysics_tpu.dataset.sample import RawSample
from graphphysics_tpu.topology import (
    add_random_edges,
    cartesian_distance_features,
    k_hop_edges,
    world_pos_features,
)


class BaseDataset(abc.ABC):
    """Shared per-item pipeline (reference ``BaseDataset``, ``dataset.py:18-203``):

    ``load -> preprocessing -> k-hop (cached per trajectory) -> drop edge attrs
    -> random edges -> masking -> pad to static budgets``.

    ``edge_layout``: "coo" (default — XLA fuses the sorted scatter/gather well
    on TPU; measured fastest end-to-end), "csr" (edges sorted by sender with
    per-block offsets — routes transformer attention through the fused Pallas
    softmax+SpMM kernel, ``ops.pallas_attention``; measured faster at
    large-3D-mesh scale), or "ell" (experimental fixed-degree owner-grouped
    layout, ``topology.ell`` — scatter-free dense reductions, currently
    slower under XLA's broadcast/reshape lowering).
    """

    def __init__(
        self,
        meta_path: str,
        preprocessing: Optional[Callable] = None,
        masking_ratio: Optional[float] = None,
        khop: int = 1,
        new_edges_ratio: float = 0.0,
        add_edge_features: bool = True,
        use_previous_data: bool = False,
        world_pos_parameters: Optional[dict] = None,
        node_type_index: Optional[int] = None,
        node_budget: Optional[int] = None,
        edge_budget: Optional[int] = None,
        bucket_multiple: int = 128,
        edge_headroom: float = 1.15,
        seed: int = 0,
        edge_layout: str = "coo",
        ell_degree: Optional[int] = None,
        csr_max_chunks: Optional[int] = None,
        num_buckets: int = 1,
    ):
        with open(meta_path, "r") as fp:
            self.meta: Dict[str, Any] = json.load(fp)

        self.trajectory_length: int = self.meta["trajectory_length"]
        self.preprocessing = preprocessing
        self.masking_ratio = masking_ratio
        self.khop = khop
        self.new_edges_ratio = new_edges_ratio
        self.add_edge_features = add_edge_features
        self.use_previous_data = use_previous_data
        self.node_type_index = node_type_index
        self.node_budget = node_budget
        self.edge_budget = edge_budget
        self.bucket_multiple = bucket_multiple
        self.edge_headroom = edge_headroom
        self.seed = seed
        if edge_layout not in ("ell", "coo", "csr"):
            raise ValueError(f"unknown edge_layout {edge_layout!r}")
        self.edge_layout = edge_layout
        self.ell_degree = ell_degree
        self.csr_max_chunks = csr_max_chunks  # static chunk budget
        # size buckets (SURVEY.md §7.1 "pad nodes/edges to bucket
        # boundaries"): heterogeneous-size datasets pad each trajectory to
        # the smallest of `num_buckets` budgets instead of the global max —
        # one compiled step per bucket, far less padding compute. The loader
        # groups batches by bucket (GraphLoader keeps every batch one shape).
        if bucket_multiple < 1:
            raise ValueError(f"bucket_multiple must be >= 1, got {bucket_multiple}")
        if edge_headroom < 1.0:
            raise ValueError(f"edge_headroom must be >= 1.0, got {edge_headroom}")
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        if num_buckets > 1:
            if edge_layout != "coo":
                raise ValueError(
                    "num_buckets > 1 requires edge_layout='coo' (the "
                    "csr/ell static layouts assume one global budget)"
                )
            if node_budget is not None or edge_budget is not None:
                raise ValueError(
                    "num_buckets > 1 derives per-bucket budgets; don't also "
                    "pass node_budget/edge_budget"
                )
        self.num_buckets = num_buckets
        self._bucket_node_budgets: Optional[List[int]] = None
        self._bucket_edge_budgets: Optional[List[int]] = None
        self._traj_bucket: Optional[np.ndarray] = None
        self._canonical_sample_cache: Optional[RawSample] = None
        self._node_counts_cache: Any = False  # False = not scanned yet
        self._padded_any = False  # guards set_edge_layout
        self._epoch = 0

        self.world_pos_index_start = None
        self.world_pos_index_end = None
        if world_pos_parameters is not None:
            self.world_pos_index_start = world_pos_parameters.get(
                "world_pos_index_start"
            )
            self.world_pos_index_end = world_pos_parameters.get("world_pos_index_end")

        # k-hop caches keyed by trajectory (reference ``dataset.py:39-44``)
        self._khop_edges_cache: Dict[int, tuple] = {}
        self._khop_attr_cache: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ API

    def set_edge_layout(self, edge_layout: str) -> None:
        """Switch the device edge layout BEFORE any item is padded.

        Used by ``edge_layout: "auto"`` in the training config
        (``parse_parameters.get_dataset``): the layout choice depends on the
        model family and mesh scale, which the dataset alone doesn't know.
        Raises once an item has been padded — items already handed out would
        have a different static shape than future ones."""
        if edge_layout not in ("ell", "coo", "csr"):
            raise ValueError(f"unknown edge_layout {edge_layout!r}")
        if edge_layout == self.edge_layout:
            return
        if self.num_buckets > 1:
            raise ValueError("num_buckets > 1 requires edge_layout='coo'")
        if self._padded_any:
            raise ValueError(
                "set_edge_layout must run before the first item is padded "
                "(items already handed out have a different static shape)"
            )
        self.edge_layout = edge_layout

    @property
    @abc.abstractmethod
    def size_dataset(self) -> int:
        """Number of trajectories."""

    @abc.abstractmethod
    def _load(self, index: int) -> RawSample:
        """Load the raw (unpreprocessed) frame sample for a flat index."""

    def scan_node_counts(self) -> Optional[List[int]]:
        """Cheap per-trajectory node counts (no data read), or None if the
        format can't provide them cheaply. Used to size static budgets so
        mixed-size trajectory datasets (real aneurysm/bezier data) never
        exceed the budget mid-training."""
        return None

    def node_counts(self) -> Optional[List[int]]:
        """``scan_node_counts`` computed once and cached — the counts are
        immutable for a dataset, and the scan opens every trajectory file
        (use this, not scan_node_counts, anywhere the result may be needed
        more than once: budget derivation, bucketing, auto layout)."""
        if self._node_counts_cache is False:  # sentinel: None is a valid result
            self._node_counts_cache = self.scan_node_counts()
        return self._node_counts_cache

    @property
    def frames_per_trajectory(self) -> int:
        """Usable frames per trajectory: T-1 (each needs a target), minus one
        more with previous-data (frame 0 has no predecessor). NB: the
        reference's ``__len__`` ignores the previous-data shift
        (``dataset.py:80-84``), so its last index maps to a frame with no
        target and raises (``xdmf_dataset.py:102-105``) — fixed here."""
        return self.trajectory_length - 1 - int(self.use_previous_data)

    def __len__(self) -> int:
        return self.size_dataset * self.frames_per_trajectory

    def get_traj_frame(self, index: int) -> tuple:
        """Flat index -> (trajectory, frame); with previous-data the usable
        frames shift by one (reference ``dataset.py:66-81``)."""
        per = self.frames_per_trajectory
        traj = index // per
        frame = index % per + int(self.use_previous_data)
        return traj, frame

    def set_epoch(self, epoch: int) -> None:
        """Reseed per-item randomness (noise, random edges, masking)."""
        self._epoch = epoch

    def __getitem__(self, index: int) -> Graph:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, index])
        )
        sample, exclude = self._build_sample(index, rng)
        if (
            index == 0
            and self._epoch == 0
            and self._canonical_sample_cache is None
        ):
            # this IS the canonical sample (same rng derivation): reuse it so
            # startup doesn't build item 0 twice back-to-back
            self._canonical_sample_cache = sample
        graph = self._pad(sample, exclude)
        self._drop_canonical_if_done()
        return graph

    def _build_sample(self, index: int, rng: np.random.Generator):
        """The pre-padding item pipeline: load -> preprocessing -> k-hop ->
        random edges -> masking. Shared by ``__getitem__`` and the canonical
        budget derivation."""
        sample = self._load(index)
        traj_index = sample.traj_index

        if self.preprocessing is not None:
            sample = self.preprocessing(sample, rng)
        if sample.senders is None:
            # no preprocessing built edges: derive from faces
            from graphphysics_tpu.dataset.preprocessing import apply_face_to_edge

            sample = apply_face_to_edge(sample, rng)

        sample = self._apply_k_hop(sample, traj_index)
        if not self.add_edge_features:
            sample.edge_attr = None
        sample = self._add_random_edges(sample, rng)
        exclude = self._masked_indexes(sample, rng)
        return sample, exclude

    def _canonical_sample(self) -> RawSample:
        """The processed (pre-padding) sample of flat item 0 at a FIXED seed
        (epoch 0) — the single source for every lazily-derived static budget
        (edges-per-node extrapolation, CSR chunk count). Deriving from
        whichever sample a process happens to pad first would let independent
        processes (multi-host training in particular) derive different padded
        shapes and compile mismatched programs."""
        if self._canonical_sample_cache is None:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, 0, 0])
            )
            # pin the dataset epoch too: _load implementations draw their own
            # per-(seed, epoch, index) randomness (e.g. XDMF multi-dt frame
            # offsets), and canonical means "as at epoch 0" regardless of
            # when (mid-training, post-resume) the budgets materialize
            saved_epoch, self._epoch = self._epoch, 0
            try:
                self._canonical_sample_cache = self._build_sample(0, rng)[0]
            finally:
                self._epoch = saved_epoch
        return self._canonical_sample_cache

    def _drop_canonical_if_done(self) -> None:
        """Free the cached canonical RawSample (tens of MB at large-mesh
        scale, and pickled into every spawned worker) once every lazy static
        budget it can feed has materialized."""
        if self._canonical_sample_cache is None:
            return
        if self.num_buckets > 1:
            done = (
                self._bucket_node_budgets is not None
                and self._bucket_edge_budgets is not None
            )
        elif self.edge_layout == "ell":
            done = self.node_budget is not None and self.ell_degree is not None
        elif self.edge_layout == "csr":
            done = (
                self.node_budget is not None
                and self.edge_budget is not None
                and self.csr_max_chunks is not None
            )
        else:
            done = self.node_budget is not None and self.edge_budget is not None
        if done:
            self._canonical_sample_cache = None

    def trajectory_indices(self, traj_index: int) -> List[int]:
        per = self.frames_per_trajectory
        return list(range(traj_index * per, (traj_index + 1) * per))

    # ------------------------------------------------------------ pipeline

    def _apply_k_hop(self, sample: RawSample, traj_index: int) -> RawSample:
        """k-hop adjacency expansion with per-trajectory cache. On the first
        frame of a trajectory, edge features are recomputed from scratch on
        the k-hop graph (reference ``compute_k_hop_graph``,
        ``torch_graph.py:56-112``); every later frame reuses the cached
        edge index AND edge features — faithfully mirroring the reference's
        cache (``dataset/dataset.py:150-168``), including its staleness for
        frame-varying inputs (world edges / world-pos features / noise are
        frozen from the cached frame when combined with khop > 1)."""
        if self.khop <= 1:
            return sample
        if traj_index in self._khop_edges_cache:
            sample.senders, sample.receivers = self._khop_edges_cache[traj_index]
            if self.add_edge_features:
                sample.edge_attr = self._khop_attr_cache[traj_index]
            return sample

        s, r = k_hop_edges(
            sample.senders, sample.receivers, sample.num_nodes, self.khop
        )
        sample.senders, sample.receivers = s, r
        self._khop_edges_cache[traj_index] = (s, r)
        if self.add_edge_features:
            attr = cartesian_distance_features(sample.pos, s, r)
            if (
                self.world_pos_index_start is not None
                and self.world_pos_index_end is not None
            ):
                wp = sample.x[:, self.world_pos_index_start : self.world_pos_index_end]
                attr = world_pos_features(wp, s, r, attr)
            sample.edge_attr = attr
            self._khop_attr_cache[traj_index] = attr
        return sample

    def _add_random_edges(
        self, sample: RawSample, rng: np.random.Generator
    ) -> RawSample:
        """Random long-range edges; mesh edge features recomputed from scratch
        afterwards (reference ``_add_random_edges``, ``dataset.py:104-137`` —
        note the reference also drops world-pos edge features here)."""
        if self.new_edges_ratio <= 0.0 or self.new_edges_ratio > 1.0:
            return sample
        s, r = add_random_edges(
            sample.senders,
            sample.receivers,
            sample.num_nodes,
            self.new_edges_ratio,
            rng,
        )
        sample.senders, sample.receivers = s, r
        if self.add_edge_features:
            sample.edge_attr = cartesian_distance_features(sample.pos, s, r)
        return sample

    def _masked_indexes(
        self, sample: RawSample, rng: np.random.Generator
    ) -> Optional[np.ndarray]:
        """Boolean exclude mask over kept (visible) nodes — the MeshMask
        ``selected_indexes`` semantics (``torch_graph.py:285-302`` +
        ``loss.py:20-24``: selected nodes are excluded from the loss)."""
        if self.masking_ratio is None:
            return None
        n = sample.num_nodes
        num_keep = int((1.0 - self.masking_ratio) * n)
        keep = rng.permutation(n)[:num_keep]
        mask = np.zeros(n, dtype=bool)
        mask[keep] = True
        return mask

    def _materialize_buckets(self) -> bool:
        """Build the per-trajectory bucket assignment from the node-count
        scan; returns False (and collapses to the single global budget) when
        the format can't scan counts or all trajectories are one size."""
        if self._traj_bucket is not None:
            return True
        if self.num_buckets <= 1:
            return False
        counts = self.node_counts()
        if not counts or len(set(counts)) == 1:
            self.num_buckets = 1
            return False
        rounded = [round_up(c, self.bucket_multiple) for c in counts]
        budgets = sorted(set(rounded))
        if len(budgets) > self.num_buckets:
            # spread the kept budgets across the sorted distinct sizes; the
            # largest is always kept so nothing can overflow
            pos = np.linspace(0, len(budgets) - 1, self.num_buckets)
            budgets = sorted({budgets[int(round(p))] for p in pos})
        self._bucket_node_budgets = budgets
        self._traj_bucket = np.searchsorted(np.array(budgets), np.array(rounded))
        self.num_buckets = len(budgets)
        return True

    def bucket_of_index(self, index: int) -> int:
        """Bucket id of a flat item index (0 for un-bucketed datasets) —
        the loader groups batches by this so every batch is one shape."""
        if not self._materialize_buckets():
            return 0
        traj, _ = self.get_traj_frame(index)
        return int(self._traj_bucket[traj])

    def _bucket_budgets(self, sample: RawSample) -> tuple:
        b = int(self._traj_bucket[sample.traj_index])
        if self._bucket_edge_budgets is None:
            # extrapolate the CANONICAL sample's edges-per-node to every
            # bucket — deterministic across processes/hosts, unlike "the
            # first sample this process pads" (same caveat as the global
            # budget: degree-heterogeneous data should raise edge_headroom;
            # overflow raises loudly)
            canon = self._canonical_sample()
            per_node = canon.num_edges / max(canon.num_nodes, 1)
            self._bucket_edge_budgets = [
                round_up(
                    int(per_node * nb * self.edge_headroom),
                    self.bucket_multiple,
                )
                for nb in self._bucket_node_budgets
            ]
        return self._bucket_node_budgets[b], self._bucket_edge_budgets[b]

    def _pad(self, sample: RawSample, exclude: Optional[np.ndarray]) -> Graph:
        self._padded_any = True
        n, e = sample.num_nodes, sample.num_edges
        if self._materialize_buckets():
            nb, eb = self._bucket_budgets(sample)
            if n > nb:
                raise ValueError(f"sample exceeds bucket node budget: {n}>{nb}")
            if e > eb:
                raise ValueError(
                    f"sample exceeds bucket edge budget: {e}>{eb}; raise "
                    f"edge_headroom"
                )
            graph = pad_graph_np(
                sample.x,
                sample.pos,
                sample.senders,
                sample.receivers,
                n_pad=nb,
                e_pad=eb,
                edge_attr=sample.edge_attr,
                y=sample.y,
                node_type_index=self.node_type_index,
            )
            if exclude is not None:
                padded = np.zeros(nb, dtype=bool)
                padded[: len(exclude)] = exclude
                graph = graph.replace(exclude_mask=padded)
            return graph
        if self.node_budget is None:
            counts = self.node_counts()
            # no preprocessing step changes the node count, so the max raw
            # trajectory size bounds every future sample; with no scan the
            # CANONICAL sample sizes the budget (deterministic across
            # processes/hosts — a larger sample later raises loudly below)
            canon_n = self._canonical_sample().num_nodes
            n_max = max(max(counts) if counts else 0, canon_n)
            self.node_budget = round_up(n_max, self.bucket_multiple)
            if self.edge_layout == "csr":
                # the Pallas attention kernel needs whole node blocks (also
                # keeps concat-batch blocks within one graph)
                from graphphysics_tpu.ops.pallas_attention import BLOCK_NODES

                self.node_budget = round_up(self.node_budget, BLOCK_NODES)
            if self.edge_budget is None and counts and max(counts) > canon_n:
                # scale the edge budget by the worst-case node count. NB this
                # extrapolates the CANONICAL sample's edges-per-node; for
                # degree-heterogeneous datasets pass edge_budget explicitly
                # or raise edge_headroom (the overflow error says so).
                canon = self._canonical_sample()
                per_node = canon.num_edges / max(canon.num_nodes, 1)
                self.edge_budget = round_up(
                    int(per_node * self.node_budget * self.edge_headroom),
                    self.bucket_multiple,
                )
        if n > self.node_budget:
            raise ValueError(
                f"sample exceeds node budget: {n}>{self.node_budget}; pass "
                f"node_budget explicitly for mixed-size datasets"
            )

        if self.edge_layout == "ell":
            graph = self._pad_ell(sample)
        else:
            if self.edge_budget is None:
                canon_e = self._canonical_sample().num_edges
                self.edge_budget = round_up(
                    int(canon_e * self.edge_headroom), self.bucket_multiple
                )
            if e > self.edge_budget:
                raise ValueError(
                    f"sample exceeds edge budget: {e}>{self.edge_budget}; raise "
                    f"edge_budget or edge_headroom"
                )
            if self.edge_layout == "csr":
                graph = self._pad_csr(sample)
            else:
                graph = pad_graph_np(
                    sample.x,
                    sample.pos,
                    sample.senders,
                    sample.receivers,
                    n_pad=self.node_budget,
                    e_pad=self.edge_budget,
                    edge_attr=sample.edge_attr,
                    y=sample.y,
                    node_type_index=self.node_type_index,
                )
        if exclude is not None:
            padded = np.zeros(self.node_budget, dtype=bool)
            padded[: len(exclude)] = exclude
            graph = graph.replace(exclude_mask=padded)
        return graph

    def _pad_csr(self, sample: RawSample) -> Graph:
        """Sender-sorted CSR padding for the fused Pallas attention kernel.

        The per-sample chunk count must stay within the dataset's static
        budget (``csr_max_chunks``, fixed after the first sample with
        headroom) so the jitted step compiles once; overflow raises instead
        of silently dropping edges."""
        from graphphysics_tpu.core.graph import pad_graph_csr_np

        graph = pad_graph_csr_np(
            sample.x,
            sample.pos,
            sample.senders,
            sample.receivers,
            n_pad=self.node_budget,
            e_pad=self.edge_budget,
            edge_attr=sample.edge_attr,
            y=sample.y,
            node_type_index=self.node_type_index,
        )
        if self.csr_max_chunks is None:
            # +2 headroom: random/world edges can skew later samples' degrees.
            # Derived from the CANONICAL sample (not whichever sample this
            # process pads first) so independent hosts agree on the static
            # chunk budget.
            from graphphysics_tpu.ops.pallas_attention import (
                compute_block_bounds,
                compute_max_chunks_bounds,
            )

            canon = self._canonical_sample()
            ss = np.sort(np.asarray(canon.senders))
            bounds = compute_block_bounds(
                ss, self.node_budget, num_real_edges=len(ss)
            )
            self.csr_max_chunks = compute_max_chunks_bounds(bounds) + 2
        if (graph.csr_max_chunks or 1) > self.csr_max_chunks:
            raise ValueError(
                f"sample needs {graph.csr_max_chunks} CSR chunks > static "
                f"budget {self.csr_max_chunks}; pass csr_max_chunks="
                f"{graph.csr_max_chunks} (or more) to the dataset, or use "
                f"edge_layout='coo'"
            )
        return graph.replace(csr_max_chunks=self.csr_max_chunks)

    def _pad_ell(self, sample: RawSample) -> Graph:
        """Fixed-degree ELL padding (the scatter-free device layout); falls
        back to COO permanently if this topology is not symmetric."""
        from graphphysics_tpu.core.graph import pad_graph_ell_np
        from graphphysics_tpu.topology.ell import max_in_degree

        first_sample = self.ell_degree is None
        if first_sample:
            # derive from the CANONICAL sample (same reasoning as the edge/
            # CSR budgets: independent processes must agree on the static
            # degree) with +4 headroom — random edges / per-frame world
            # edges can push later samples higher
            canon = self._canonical_sample()
            dmax = max_in_degree(canon.receivers, self.node_budget)
            self.ell_degree = max(((dmax + 4 + 3) // 4) * 4, 4)
        try:
            return pad_graph_ell_np(
                sample.x,
                sample.pos,
                sample.senders,
                sample.receivers,
                n_pad=self.node_budget,
                degree=self.ell_degree,
                edge_attr=sample.edge_attr,
                y=sample.y,
                node_type_index=self.node_type_index,
            )
        except ValueError as err:
            if "not symmetric" in str(err) and first_sample:
                # e.g. user-supplied asymmetric extra edges: switch to COO —
                # only before any ELL graph was produced (a mid-run switch
                # would mix incompatible layouts within one batch)
                print(f"[dataset] ELL unavailable ({err}); falling back to COO")
                self.edge_layout = "coo"
                self.ell_degree = None
                return self._pad(sample, None)
            if "exceeds ELL degree" in str(err):
                raise ValueError(
                    f"{err}; pass an explicit ell_degree with more headroom "
                    f"(current budget {self.ell_degree})"
                ) from err
            raise
