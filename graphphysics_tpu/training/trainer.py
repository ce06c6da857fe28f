"""Training orchestration: jitted train step, rollout validation, checkpoints.

The TPU-native replacement for the reference's Lightning stack
(``graphphysics/training/lightning_module.py`` + ``train.py``): a single
``Trainer`` owning a jitted donated train step (AdamW + per-step cosine-warmup
schedule, ``lightning_module.py:275-292``), scan-based rollout validation with
``val_all_rollout_rmse`` (``:242-257``), XDMF rollout export (``:124-161``),
CSV/W&B metrics, and full-state checkpointing.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphphysics_tpu.core.graph import Graph, stack_graphs
from graphphysics_tpu.core.nodetype import NodeType
from graphphysics_tpu.training import losses as losses_mod
from graphphysics_tpu.training.checkpoint import (
    _resolve_orbax_dir,
    load_checkpoint_with_metadata,
    require_backend,
    save_checkpoint,
    wait_for_async_saves,
)
from graphphysics_tpu.training.parse_parameters import get_simulator
from graphphysics_tpu.training.rollout import jitted_rollout, rollout_rmse
from graphphysics_tpu.training.schedule import cosine_warmup_schedule
from graphphysics_tpu.utils.metrics import CSVMetricsLogger
from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesWriter


# reorder-permutation cache bound: each entry is an O(N) int array, and
# shuffled multi-trajectory batches produce a fresh edge-list digest per
# batch composition — without a cap the cache grows for the whole run
_REORDER_CACHE_MAX = 32


class Trainer:
    def __init__(
        self,
        parameters: Dict[str, Any],
        learning_rate: float = 1e-3,
        warmup: int = 1000,
        num_steps: Optional[int] = None,
        masks: Sequence[int] = (NodeType.NORMAL, NodeType.OUTFLOW),
        use_previous_data: bool = False,
        previous_data_start: Optional[int] = None,
        previous_data_end: Optional[int] = None,
        checkpoint_dir: str = "checkpoints",
        checkpoint_name: str = "state.msgpack",
        metrics_path: Optional[str] = "metrics.csv",
        rollout_dir: Optional[str] = "meshes",
        seed: int = 42,
        log_every: int = 100,
        extra_logger=None,
        plot_callback=None,
        data_parallel: bool = False,
        gradient_accumulation: bool = False,
        graph_partition: int = 0,
        partition_mode: str = "halo",
        partition_edge_headroom: float = 1.25,
        partition_budget_growth: bool = True,
        partition_reorder: Optional[str] = None,
        partition_overlap_attention: bool = True,
        halo_dtype: Optional[str] = None,
        partitioned_validation: bool = False,
        num_devices: Optional[int] = None,
        save_every_n_steps: Optional[int] = None,
        checkpoint_backend: str = "msgpack",
        profile_dir: Optional[str] = None,
        profile_start_step: int = 10,
        profile_num_steps: int = 3,
        parallel_validation: bool = True,
        progress: Optional[bool] = None,
    ):
        self.param = parameters
        self.learning_rate = learning_rate
        self.warmup = warmup
        self.num_steps = num_steps
        self.masks = [int(m) for m in masks]
        self.use_previous_data = use_previous_data
        self.previous_data_start = previous_data_start
        self.previous_data_end = previous_data_end
        self.checkpoint_dir = checkpoint_dir
        if checkpoint_backend != "msgpack" and checkpoint_name == "state.msgpack":
            checkpoint_name = "state.orbax"  # directory, not a msgpack file
        self.checkpoint_name = checkpoint_name
        self.metrics = CSVMetricsLogger(metrics_path) if metrics_path else None
        self.rollout_dir = rollout_dir
        self.seed = seed
        self.log_every = log_every
        self.extra_logger = extra_logger
        self.plot_callback = plot_callback
        self.data_parallel = data_parallel
        # gradient accumulation: the loader's stacked [M, ...] batch is M
        # sequential microbatches per optimizer step (training/microbatch.py)
        self.gradient_accumulation = gradient_accumulation
        if data_parallel and gradient_accumulation:
            raise ValueError(
                "data_parallel and gradient_accumulation are separate batch "
                "layouts; combine them by raising the per-device batch "
                "instead (see docs/scaling.md)"
            )
        # edge-partitioned training (parallel/graph_partition.py): every
        # batch graph splits into `graph_partition` contiguous node blocks
        # host-side; the per-layer exchange ("halo" all_to_all of boundary
        # rows, or "gather" full-table all_gather) rides the graph mesh
        # axis. Combines with data_parallel into the 2-D (data x graph)
        # pod-scale step. Validation rollouts default to unpartitioned: an
        # eval forward holds no autodiff activations, so meshes that need
        # partitioned TRAINING usually still validate on one chip
        # (partitioned_validation=True covers the rest).
        self.graph_partition = int(graph_partition)
        if partition_mode not in ("halo", "gather"):
            raise ValueError(f"unknown partition_mode {partition_mode!r}")
        self.partition_mode = partition_mode
        self.partition_edge_headroom = float(partition_edge_headroom)
        # a batch that exceeds the canonical static budgets re-derives them
        # from itself (monotone grow -> one recompile) instead of aborting
        # the run; makes partition_edge_headroom=1.0 — the efficient choice
        # for fixed-topology datasets, where the projected-ICI tables in
        # docs/scaling.md apply — safe against the odd outlier batch.
        # Set False to keep the hard budget error (bit-identical padded
        # shapes run-to-run matter more than survival, e.g. determinism
        # replays).
        self.partition_budget_growth = bool(partition_budget_growth)
        self._budget_gen = 0
        # locality-aware node reordering before the contiguous-block cut
        # (parallel/reorder.py): shrinks the halo volume when the dataset's
        # node numbering is not already locality-friendly; training is
        # permutation-equivariant, and validation/predict outputs are mapped
        # back through the inverse permutation
        if partition_reorder in ("none", ""):
            partition_reorder = None
        if partition_reorder not in (None, "rcm", "bfs", "hilbert"):
            raise ValueError(
                f"unknown partition_reorder {partition_reorder!r} "
                f"(rcm | bfs | hilbert)"
            )
        self.partition_reorder = partition_reorder
        # split-edge halo layout for the transformer path (graph_partition +
        # partition_mode="halo" + EncodeTransformDecode): edges lay out
        # [local | halo] so attention computes the local partial softmax
        # independently of the all_to_all and merges online-softmax stats —
        # XLA can overlap the collective with the bulk of the attention
        # compute (ops/attention.py; exact-parity vs the unsplit layout).
        self.partition_overlap_attention = bool(partition_overlap_attention)
        # wire dtype for the per-layer halo all_to_all ("bf16" halves the
        # dominant multi-chip comms bytes; local math stays f32 — see
        # ops/halo.halo_table). Only meaningful with partition_mode="halo".
        if halo_dtype in ("none", ""):
            halo_dtype = None
        if halo_dtype not in (None, "bf16", "f16"):
            raise ValueError(
                f"unknown halo_dtype {halo_dtype!r} (bf16 | f16 | None)"
            )
        if halo_dtype is not None and partition_mode != "halo":
            # the gather path ships the full node table; silently ignoring
            # the knob would let users believe their comms were halved
            raise ValueError(
                'halo_dtype requires partition_mode="halo" (the gather '
                "mode's all_gather has no 16-bit wire path)"
            )
        self.halo_dtype = halo_dtype
        if self.graph_partition and gradient_accumulation:
            raise ValueError(
                "graph_partition does not combine with gradient_accumulation "
                "(partition the graph OR microbatch the batch; both at once "
                "would need a [M, P, ...] layout nothing produces)"
            )
        # static per-part budgets, derived once per batch shape (a canonical
        # trial partition x headroom) so every step compiles to the same
        # shapes; keyed by (nodes, edges) so size-bucketed datasets get one
        # budget pair per bucket instead of a mismatched global one.
        # fit() pre-derives them from the DATASET's canonical items (item 0 /
        # per-bucket first item, at epoch 0) so padded shapes — and the
        # persistent-compile-cache keys — are identical run-to-run and across
        # resumes, matching the repo's canonical static-budget convention;
        # the first-batch derivation below remains as a fallback for direct
        # train-step use without a loader
        self._part_budgets = {}
        # locality-reorder permutations keyed by (method, edge-list digest):
        # static mesh topology -> one scipy solve, not one per batch.
        # LRU-capped: shuffled multi-trajectory batches give a fresh digest
        # per batch composition (each entry is an O(N) perm array)
        from collections import OrderedDict

        self._reorder_cache = OrderedDict()
        # partitioned_validation=True runs validation rollouts edge-
        # partitioned over the training graph mesh too (for meshes whose
        # EVAL forward doesn't fit one chip); trajectories go sequentially,
        # one rollout spread across the graph axis per trajectory
        self.partitioned_validation = bool(partitioned_validation)
        if self.partitioned_validation and not self.graph_partition:
            raise ValueError("partitioned_validation requires graph_partition")
        self.num_devices = num_devices
        self.save_every_n_steps = save_every_n_steps
        # "msgpack" (one portable file) | "orbax" | "orbax-async" (periodic
        # mid-epoch saves return after the device->host copy; disk writes
        # happen in the background)
        self.checkpoint_backend = checkpoint_backend
        require_backend(checkpoint_backend)  # missing orbax fails NOW, not
        # after the first epoch of compute
        # jax.profiler trace of steps [start, start+num) (reference has no
        # profiler integration, SURVEY.md §5; view with TensorBoard/xprof).
        # NB through the tunnel per-op times carry ~0.7 ms/op overhead —
        # relative comparisons only (utils/profiling.py).
        self.profile_dir = profile_dir
        self.profile_start_step = profile_start_step
        self.profile_num_steps = profile_num_steps
        self._trace_active = False
        self._trace_done = False
        self._trace_started_at = 0
        self.mesh = None
        # validation rollouts of different trajectories are independent; when
        # more than one device is visible they run batched over the data mesh
        # axis (reference validates strictly sequentially,
        # lightning_module.py:204-232)
        self.parallel_validation = parallel_validation
        # in-place progress line (reference utils/progressbar.py analog):
        # None = auto (TTY only), never fetches device values
        self.progress = progress
        self._val_mesh = None
        # preemption handling (reference has none, SURVEY.md §5): a SIGTERM/
        # SIGINT during fit() requests a checkpoint at the next step boundary
        self._interrupt_requested = False

        self.sim = get_simulator(parameters)
        self.K = self.sim.model.K
        self.d = self.sim.model.d
        t = self.sim.model.temperature
        self.temperature = 1.0 if t is None else t  # 0.0 is valid
        # "use_diagonal": false in the model config -> full-covariance GMM
        # head trained with the full NLL (losses.gmm_nll_loss)
        self.use_diagonal = bool(getattr(self.sim.model, "use_diagonal", True))

        self.state: Optional[Dict[str, Any]] = None
        self.tx = None
        self._train_step = None
        self._val_traj_cache: Dict[int, Graph] = {}
        self._traj_sig_cache: Dict[int, tuple] = {}
        self._val_traj_cache_owner = None
        self.last_val_loss: Optional[float] = None

    # ---------------------------------------------------------------- setup

    def _loss(self, target, out, node_type, node_valid, exclude_mask):
        if self.K == 0:
            return losses_mod.l2_loss(
                target, out, node_type, self.masks,
                node_valid=node_valid, exclude_mask=exclude_mask,
            )
        loss = (
            losses_mod.diagonal_gmm_nll_loss
            if self.use_diagonal
            else losses_mod.gmm_nll_loss
        )
        return loss(
            target, out, node_type, self.masks,
            d=self.d, K=self.K, temperature=self.temperature,
            node_valid=node_valid, exclude_mask=exclude_mask,
        )

    def _shrink_for_init(self, g: Graph, max_nodes: int = 2048) -> Graph:
        """Parameter/normalizer shapes depend only on FEATURE dims, but
        flax init runs a forward — on the full mesh that materializes on
        ONE device exactly the activations ``graph_partition`` exists to
        spread (OOM at init for the meshes the flag targets, e.g.
        ``grph-predict --graph_partition`` on a mesh whose eval forward
        needs partitioning). Take a node-prefix subgraph with the edges
        both of whose endpoints stay inside (capped); CSR/ELL layout
        metadata is dropped — the attention/message params are identical
        through the plain COO path."""
        n = int(np.asarray(g.x).shape[0])
        if n <= max_nodes:
            return g
        k = max_nodes
        s = np.asarray(g.senders)
        r = np.asarray(g.receivers)
        em = np.asarray(g.edge_mask)
        keep = np.nonzero((s < k) & (r < k) & em)[0][: 4 * k]

        def node(a):
            return None if a is None else np.asarray(a)[:k]

        if keep.size:
            senders = s[keep].astype(np.int32)
            receivers = r[keep].astype(np.int32)
            edge_mask = em[keep]
            edge_attr = (
                None if g.edge_attr is None else np.asarray(g.edge_attr)[keep]
            )
        else:  # prefix holds no edges: a masked self-loop keeps shapes valid
            senders = receivers = np.zeros(8, np.int32)
            edge_mask = np.zeros(8, bool)
            edge_attr = (
                None
                if g.edge_attr is None
                else np.zeros((8, np.asarray(g.edge_attr).shape[1]),
                              np.asarray(g.edge_attr).dtype)
            )
        return Graph(
            x=node(g.x), pos=node(g.pos),
            senders=senders, receivers=receivers, edge_attr=edge_attr,
            node_mask=node(g.node_mask), edge_mask=edge_mask,
            y=node(g.y), exclude_mask=node(g.exclude_mask),
        )

    def init_state(self, example_batch: Graph, num_steps: int):
        """Initialize params/normalizers/optimizer from one example batch."""
        if self.data_parallel or self.gradient_accumulation:
            # init from ONE graph of the stacked batch: parameter shapes
            # don't depend on batch size, and flax init runs a forward — on
            # the full flattened batch that would materialize on one device
            # exactly the monolithic-batch activations DP / gradient
            # accumulation exist to avoid (OOM at startup for batches sized
            # to fit only when sharded/microbatched)
            g0 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a[0]), example_batch
            )
        else:
            g0 = example_batch
        if self.graph_partition:
            # same reasoning at mesh (not batch) granularity: init from a
            # small subgraph instead of the full single-device mesh
            g0 = self._shrink_for_init(g0)
        gj = jax.device_put(g0)
        variables = self.sim.init(
            {"params": jax.random.key(self.seed), "sample": jax.random.key(1)}, gj
        )
        schedule = cosine_warmup_schedule(self.learning_rate, self.warmup, num_steps)
        self.schedule = schedule
        self.tx = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=1e-4)
        self.state = {
            "params": variables["params"],
            "normalizer": variables["normalizer"],
            "opt_state": self.tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.graph_partition:
            self._build_graph_partition_train_step()
        elif self.data_parallel:
            self._build_dp_train_step()
        elif self.gradient_accumulation:
            self._build_microbatch_train_step()
        else:
            self._build_train_step()
        return self.state

    def _build_train_step(self):
        sim, tx = self.sim, self.tx
        nti = self.sim.config.node_type_index

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, graph: Graph):
            def loss_fn(p):
                (out, target_dn, _), mutated = sim.apply(
                    {"params": p, "normalizer": state["normalizer"]},
                    graph,
                    is_training=True,
                    mutable=["normalizer"],
                )
                node_type = graph.x[:, nti].astype(jnp.int32)
                loss = self._loss(
                    target_dn, out, node_type, graph.node_mask, graph.exclude_mask
                )
                return loss, mutated["normalizer"]

            (loss, new_norm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            return {
                "params": new_params,
                "normalizer": new_norm,
                "opt_state": new_opt,
                "step": state["step"] + 1,
            }, loss

        self._train_step = train_step

    def _build_microbatch_train_step(self):
        """Gradient-accumulation step: the loader must use collate='stack';
        each stacked [M, ...] batch is M sequential microbatches per
        optimizer step (one microbatch's activations live at a time)."""
        from graphphysics_tpu.training.microbatch import (
            make_microbatch_train_step,
        )

        loss_kind = "l2" if self.K == 0 else (
            "diag_gmm" if self.use_diagonal else "full_gmm"
        )
        gmm_kwargs = (
            None
            if self.K == 0
            else dict(d=self.d, K=self.K, temperature=self.temperature)
        )
        self._train_step = make_microbatch_train_step(
            self.sim,
            self.tx,
            self.masks,
            loss_kind=loss_kind,
            gmm_kwargs=gmm_kwargs,
        )

    def _build_dp_train_step(self):
        """Data-parallel step over all (or num_devices) local devices; the
        loader must use collate='stack' with batch_size divisible by the
        device count."""
        from graphphysics_tpu.parallel import make_dp_train_step, make_mesh

        self.mesh = make_mesh(self.num_devices)
        loss_kind = "l2" if self.K == 0 else (
            "diag_gmm" if self.use_diagonal else "full_gmm"
        )
        gmm_kwargs = (
            None
            if self.K == 0
            else dict(d=self.d, K=self.K, temperature=self.temperature)
        )
        self._train_step = make_dp_train_step(
            self.sim,
            self.tx,
            self.masks,
            self.mesh,
            loss_kind=loss_kind,
            gmm_kwargs=gmm_kwargs,
        )

    def _build_graph_partition_train_step(self):
        """Edge-partitioned step over a (graph,) mesh, or the 2-D
        (data x graph) step when combined with data_parallel; batches are
        partitioned host-side in ``_put_batch``."""
        from graphphysics_tpu.parallel import (
            make_dp_graph_parallel_train_step,
            make_graph_parallel_train_step,
            make_mesh,
        )
        from graphphysics_tpu.parallel.mesh import DATA_AXIS, GRAPH_AXIS

        parts = self.graph_partition
        loss_kind = "l2" if self.K == 0 else (
            "diag_gmm" if self.use_diagonal else "full_gmm"
        )
        gmm_kwargs = (
            None
            if self.K == 0
            else dict(d=self.d, K=self.K, temperature=self.temperature)
        )
        if self.data_parallel:
            total = self.num_devices or len(jax.devices())
            if total % parts:
                raise ValueError(
                    f"graph_partition {parts} must divide the device count "
                    f"{total} (data axis = devices / partitions)"
                )
            self.mesh = make_mesh(
                total, (DATA_AXIS, GRAPH_AXIS), shape=(total // parts, parts)
            )
            self._train_step = make_dp_graph_parallel_train_step(
                self.sim, self.tx, self.masks, self.mesh,
                loss_kind=loss_kind, gmm_kwargs=gmm_kwargs,
            )
        else:
            self.mesh = make_mesh(parts, (GRAPH_AXIS,))
            self._train_step = make_graph_parallel_train_step(
                self.sim, self.tx, self.masks, self.mesh,
                loss_kind=loss_kind, gmm_kwargs=gmm_kwargs,
            )

    def _derive_partition_budgets(self, train_loader) -> None:
        """Pre-derive the static per-part budgets from CANONICAL items (the
        dataset's item 0, or each bucket's lowest index, built at epoch 0) so
        the padded shapes do not depend on which shuffled batch a given run
        or resume happens to see first."""
        ds = getattr(train_loader, "dataset", None)
        if ds is None:
            return  # lazy first-batch fallback in _partition_graph
        if hasattr(ds, "set_epoch"):
            ds.set_epoch(0)  # fit() re-sets the epoch before iterating
        reps = [0]
        if (
            getattr(ds, "num_buckets", 1) > 1
            and hasattr(ds, "bucket_of_index")
        ):
            by_bucket: Dict[int, int] = {}
            for i in range(len(ds)):
                b = ds.bucket_of_index(i)
                by_bucket.setdefault(b, i)
            reps = sorted(by_bucket.values())
        from graphphysics_tpu.core.graph import concat_graphs

        bsz = int(getattr(train_loader, "batch_size", 1))
        for i in reps:
            g0 = ds[int(i)]
            if self.data_parallel:
                probe = g0  # stacked batches partition per graph
            else:
                probe = concat_graphs([g0] * max(bsz, 1))
            size_key = (
                int(probe.num_nodes), int(np.asarray(probe.senders).shape[0])
            )
            if size_key not in self._part_budgets:
                csr = probe.csr_bounds is not None
                probe, _ = self._maybe_reorder(probe)
                self._part_budgets[size_key] = self._trial_budgets(
                    probe, csr=csr
                )

    def _split_attention(self) -> bool:
        # True when partitioned batches should use the split-edge
        # [local | halo] layout (partition_graph_halo_np(split_local=True)):
        # halo mode + transformer model + the knob on. The split is
        # exact-parity and lets XLA overlap the halo all_to_all with the
        # local attention partial; EPD keeps the plain layout (its
        # GraphNetBlock already overlaps via the SplitDense edge MLP).
        from graphphysics_tpu.models.processors import EncodeTransformDecode

        return (
            self.partition_overlap_attention
            and self.partition_mode == "halo"
            and isinstance(self.sim.model, EncodeTransformDecode)
        )

    def _trial_budgets(self, g: Graph, csr: Optional[bool] = None):
        """(edge_budget, halo_budget, csr_max_chunks) from a trial partition
        of ``g`` with the configured headroom. ``csr_max_chunks`` (CSR
        batches only) is canonicalized here too: every partitioned batch of
        this shape carries the same static chunk budget, so the step
        compiles once and stacked DP x graph batches share one pytree.
        ``csr`` overrides the bounds-presence check (reordering drops the
        input's bounds but not its layout choice)."""
        from graphphysics_tpu.core.graph import round_up
        from graphphysics_tpu.parallel.graph_partition import (
            partition_graph_halo_np,
            partition_graph_np,
        )

        parts = self.graph_partition
        halo = self.partition_mode == "halo"
        if csr is None:
            csr = g.csr_bounds is not None
        split = self._split_attention()
        trial = (
            partition_graph_halo_np(g, parts, csr=csr, split_local=split)
            if halo
            else partition_graph_np(g, parts, csr=csr)
        )
        h = self.partition_edge_headroom
        if split:
            el = trial.num_local_edges
            eh = trial.senders.shape[1] - el
            eb = (
                round_up(int(el * h), 128),
                round_up(int(eh * h), 128),
            )
        else:
            eb = round_up(int(trial.senders.shape[1] * h), 128)
        hb = (
            round_up(int(trial.halo_send_idx.shape[2] * h), 8)
            if halo
            else None
        )
        mc = (
            int(np.ceil(trial.csr_max_chunks * h)) + 1 if csr else None
        )
        return eb, hb, mc

    def _maybe_reorder(self, g: Graph):
        """Apply the configured locality reordering (``partition_reorder``)
        before the contiguous-block node cut. Returns ``(graph, perm)``;
        ``perm`` is None when reordering is off.

        The permutation is cached by a digest of the edge list: mesh
        topology is static across a trajectory's batches, so the scipy
        RCM/BFS/Morton solve runs once per distinct topology instead of on
        every training batch's host critical path. ("hilbert" keys on
        topology too — per-batch noise jitters pos without changing
        locality, so the first-seen batch's curve order is reused.)"""
        if not self.partition_reorder:
            return g, None
        from graphphysics_tpu.parallel.reorder import (
            locality_permutation,
            permute_graph_np,
        )

        senders = np.asarray(g.senders)
        receivers = np.asarray(g.receivers)
        edge_mask = np.asarray(g.edge_mask)
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(np.int64(g.num_nodes).tobytes())
        for a in (senders, receivers, edge_mask):
            h.update(np.ascontiguousarray(a).tobytes())
        key = (self.partition_reorder, h.hexdigest())
        perm = self._reorder_cache.get(key)
        if perm is None:
            perm = locality_permutation(
                senders,
                receivers,
                g.num_nodes,
                edge_mask=edge_mask,
                pos=np.asarray(g.pos),
                method=self.partition_reorder,
            )
            self._reorder_cache[key] = perm
            while len(self._reorder_cache) > _REORDER_CACHE_MAX:
                self._reorder_cache.popitem(last=False)
        else:
            self._reorder_cache.move_to_end(key)
        return permute_graph_np(g, perm), perm

    def _partition_graph(self, g: Graph) -> Graph:
        """Partition one (numpy, unpartitioned) Graph with the cached static
        budgets; budgets come from the canonical items via
        ``_derive_partition_budgets`` (fit), or — fallback for direct step
        use — a trial partition of the first batch of this shape."""
        from graphphysics_tpu.parallel.graph_partition import (
            partition_graph_halo_np,
            partition_graph_np,
        )

        parts = self.graph_partition
        halo = self.partition_mode == "halo"
        # edge_layout='csr'/'auto' batches compose with partitioning: each
        # part gets receiver-sorted edges + local kernel bounds, so the fused
        # Pallas attention runs inside the edge-partitioned step
        csr = g.csr_bounds is not None
        # training is node-permutation-equivariant (masked sums), so the
        # reordered partitioned step needs no inverse mapping
        g, _ = self._maybe_reorder(g)
        size_key = (int(g.num_nodes), int(np.asarray(g.senders).shape[0]))
        if size_key not in self._part_budgets:
            self._part_budgets[size_key] = self._trial_budgets(g, csr=csr)
        eb, hb, mc = self._part_budgets[size_key]

        split = self._split_attention()

        def attempt(eb, hb, mc):
            if halo:
                part = partition_graph_halo_np(
                    g, parts, edge_budget_local=eb, halo_budget=hb, csr=csr,
                    split_local=split,
                )
            else:
                part = partition_graph_np(
                    g, parts, edge_budget_local=eb, csr=csr
                )
            if csr:
                if part.csr_max_chunks > mc:
                    raise ValueError(
                        f"csr_max_chunks {part.csr_max_chunks} > static "
                        f"chunk budget {mc}"
                    )
                part = part.replace(csr_max_chunks=mc)
            if halo and self.halo_dtype is not None:
                part = part.replace(halo_dtype=self.halo_dtype)
            return part

        try:
            return attempt(eb, hb, mc)
        except ValueError as e:
            if self.partition_budget_growth:
                # budgets that fit THIS batch (x headroom), merged monotone
                # with the cached ones so earlier shapes keep compiling
                neb, nhb, nmc = self._trial_budgets(g, csr=csr)
                geb = (
                    tuple(max(a, b) for a, b in zip(eb, neb))
                    if isinstance(eb, tuple)
                    else max(eb, neb)
                )
                grown = (
                    geb,
                    max(hb, nhb) if hb is not None else nhb,
                    max(mc, nmc) if mc is not None else nmc,
                )
                if grown != (eb, hb, mc):
                    self._part_budgets[size_key] = grown
                    self._budget_gen += 1
                    print(
                        f"[trainer] batch exceeded the canonical partition "
                        f"budgets (edge {eb}, halo {hb}, csr chunks {mc}); "
                        f"grown to {grown} — padded shapes change, the "
                        f"step recompiles once"
                    )
                    return attempt(*grown)
                # growth cannot help (e.g. indivisible node count) — fall
                # through to the advisory error with the original cause
            raise ValueError(
                f"graph partitioning exceeded the static budgets derived "
                f"from the canonical batch (edge {eb}, halo {hb}, "
                f"csr chunks {mc}); raise "
                f"Trainer(partition_edge_headroom=...) above "
                f"{self.partition_edge_headroom}: {e}"
            ) from e

    def _put_partitioned_batch(self, batch: Graph):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from graphphysics_tpu.parallel.mesh import DATA_AXIS, GRAPH_AXIS

        if self.data_parallel:
            # stacked [B, ...] loader batch -> [B, P, ...] on (data, graph)
            lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
            while True:
                gen = self._budget_gen
                parts = [
                    self._partition_graph(
                        jax.tree_util.tree_map(
                            lambda a: np.asarray(a)[b], batch
                        )
                    )
                    for b in range(lead)
                ]
                if self._budget_gen == gen:
                    break
                # a later graph grew the static budgets mid-batch
                # (partition_budget_growth): re-partition the whole batch
                # so every stacked part shares the grown padded shape;
                # growth is monotone, so this converges
            stacked = stack_graphs(parts)
            sharding = NamedSharding(self.mesh, P(DATA_AXIS, GRAPH_AXIS))
        else:
            stacked = self._partition_graph(
                jax.tree_util.tree_map(np.asarray, batch)
            )
            sharding = NamedSharding(self.mesh, P(GRAPH_AXIS))
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), stacked
        )

    def _put_batch(self, batch: Graph):
        if self.graph_partition:
            return self._put_partitioned_batch(batch)
        if self.data_parallel:
            from graphphysics_tpu.parallel import shard_batch

            return shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    # ------------------------------------------------------------- training

    def fit(
        self,
        train_loader,
        val_dataset=None,
        num_epochs: int = 1,
        resume_from: Optional[str] = None,
        val_trajectories: Optional[int] = None,
    ) -> Dict[str, Any]:
        num_steps = self.num_steps or num_epochs * len(train_loader)
        start_epoch = 0
        resume_offset = 0  # batches already consumed in start_epoch

        if self.state is None:
            self.init_state(train_loader.peek(), num_steps)
        if self.graph_partition:
            self._derive_partition_budgets(train_loader)

        if resume_from and (
            os.path.exists(resume_from)
            or _resolve_orbax_dir(resume_from) is not None
        ):
            self.state, meta = load_checkpoint_with_metadata(
                resume_from, self.state
            )
            start_epoch = int(meta.get("epoch", 0))
            resume_offset = int(meta.get("batch_offset", 0))
            print(
                f"[trainer] resumed from {resume_from} at epoch {start_epoch}"
                + (f" batch {resume_offset}" if resume_offset else "")
            )

        prev_handlers = self._install_signal_handlers()
        history = {"train_loss": [], "val_rmse": [], "interrupted": False}
        try:
            for epoch in range(start_epoch, num_epochs):
                train_loader.set_epoch(epoch)
                offset = resume_offset if epoch == start_epoch else 0
                if offset:
                    # the loader's per-(seed, epoch, index) determinism makes
                    # the resumed stream bit-identical to the uninterrupted one
                    train_loader.set_start_batch(offset)
                t0, nsteps = time.time(), 0
                loss_acc = None  # device-side accumulation: no per-step host sync
                step0 = int(self.state["step"])
                from graphphysics_tpu.utils.progress import ProgressReporter

                prog = ProgressReporter(
                    len(train_loader) - offset,
                    prefix=f"epoch {epoch}",
                    enable=self.progress,
                )
                for batch in train_loader:
                    gb = self._put_batch(batch)
                    self._maybe_profile(step0 + nsteps + 1)
                    self.state, loss = self._train_step(self.state, gb)
                    nsteps += 1
                    loss_acc = loss if loss_acc is None else loss_acc + loss
                    step = step0 + nsteps  # host-side counter, no device fetch
                    if step % self.log_every == 0:
                        lr = float(self.schedule(step))
                        host_loss = float(loss)
                        self._log(epoch, step, {"train_loss": host_loss, "lr": lr})
                        # loss shown only at log points — it is already on
                        # the host there; fetching it every step would sync
                        prog.update(nsteps, loss=host_loss)
                    else:
                        prog.update(nsteps)
                    # snapshot once: a signal landing between a
                    # "should I save?" and a "should I stop?" read must not
                    # let fit() return without the checkpoint it claims
                    stop = self._interrupt_requested
                    if stop or (
                        self.save_every_n_steps
                        and step % self.save_every_n_steps == 0
                    ):
                        self.save(epoch, batch_offset=offset + nsteps)
                    if stop:
                        prog.close()
                        print(
                            f"[trainer] interrupted at epoch {epoch} "
                            f"batch {offset + nsteps}; checkpoint saved — "
                            f"resume with the same data order via "
                            f"--resume_training"
                        )
                        history["interrupted"] = True
                        return history
                prog.close()
                dt = time.time() - t0
                train_loss = float(loss_acc) / max(nsteps, 1) if nsteps else 0.0
                history["train_loss"].append(train_loss)
                msg = (
                    f"[trainer] epoch {epoch}: train_loss={train_loss:.5f} "
                    f"({nsteps} steps, {nsteps / max(dt, 1e-9):.2f} it/s)"
                )

                if val_dataset is not None:
                    val_rmse = self.validate(val_dataset, epoch, val_trajectories)
                    history["val_rmse"].append(val_rmse)
                    msg += f" val_all_rollout_rmse={val_rmse:.5f}"
                    metrics = {
                        "train_loss_epoch": train_loss,
                        "val_all_rollout_rmse": val_rmse,
                    }
                    if self.last_val_loss is not None:
                        metrics["val_loss"] = self.last_val_loss
                        msg += f" val_loss={self.last_val_loss:.5f}"
                    self._log(epoch, int(self.state["step"]), metrics)
                print(msg)

                self.save(epoch)
            return history
        finally:
            self._stop_profile()
            self._restore_signal_handlers(prev_handlers)
            wait_for_async_saves()

    def _maybe_profile(self, step: int) -> None:
        """Start/stop the jax.profiler trace window around the configured
        steps (called just before dispatching ``step``)."""
        if not self.profile_dir or self._trace_done:
            return
        # >= not ==: a resumed run's step counter starts past the configured
        # start step; trace the first profile_num_steps dispatched after it
        if not self._trace_active and step >= self.profile_start_step:
            jax.profiler.start_trace(self.profile_dir)
            self._trace_active = True
            self._trace_started_at = step
        elif (
            self._trace_active
            and step >= self._trace_started_at + self.profile_num_steps
        ):
            self._stop_profile()

    def _stop_profile(self) -> None:
        if self._trace_active:
            jax.block_until_ready(jax.tree_util.tree_leaves(self.state)[0])
            jax.profiler.stop_trace()
            self._trace_active = False
            self._trace_done = True
            print(f"[trainer] profiler trace written to {self.profile_dir}")

    def request_interrupt(self) -> None:
        """Ask fit() to checkpoint and stop at the next step boundary (what
        the SIGTERM/SIGINT handlers call; also usable programmatically)."""
        self._interrupt_requested = True

    def _install_signal_handlers(self):
        import signal

        prev = {}

        def _handler(signum, frame):
            if self._interrupt_requested:
                # second signal: stop waiting for a step boundary (e.g. stuck
                # in a long compile or validation rollout) — restore the
                # original handlers and interrupt immediately
                self._restore_signal_handlers(prev)
                raise KeyboardInterrupt(
                    f"second signal {signum} during fit(); checkpoint may be "
                    f"stale"
                )
            self.request_interrupt()
            print(
                f"[trainer] caught signal {signum}: will checkpoint and stop "
                f"at the next step boundary (signal again to abort now)"
            )

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _handler)
            except ValueError:  # not in the main thread — skip
                pass
        return prev

    def _restore_signal_handlers(self, prev):
        import signal

        self._interrupt_requested = False
        for sig, handler in prev.items():
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass

    # ----------------------------------------------------------- validation

    _VAL_TRAJ_CACHE_MAX = 4  # stacked [T, N, F] frames are large host arrays

    def _ensure_cache_owner(self, dataset) -> None:
        """Per-dataset trajectory caches: validate(val_ds) then
        predict(test_ds) must not serve the first dataset's trajectories for
        the second. The owner is held by STRONG reference (not id()) so a
        new dataset reusing a garbage-collected one's address cannot alias
        the caches."""
        if dataset is not self._val_traj_cache_owner:
            self._val_traj_cache.clear()
            self._traj_sig_cache.clear()
            self._val_traj_cache_owner = dataset

    def _stacked_trajectory(self, val_dataset, traj: int) -> Graph:
        self._ensure_cache_owner(val_dataset)
        if traj not in self._val_traj_cache:
            while len(self._val_traj_cache) >= self._VAL_TRAJ_CACHE_MAX:
                self._val_traj_cache.pop(next(iter(self._val_traj_cache)))
            frames = [val_dataset[i] for i in val_dataset.trajectory_indices(traj)]
            self._val_traj_cache[traj] = stack_graphs(frames)
        return self._val_traj_cache[traj]

    def _validation_mesh(self, n_traj: int):
        """Device mesh for parallel validation rollouts, or None (sequential).
        Reuses the DP training mesh when it is single-axis and host-local,
        else builds a data-axis mesh over THIS HOST's devices once — under
        multi-host training each process batches its own trajectory share
        over its local devices (``validate`` distributes trajectories across
        processes and reduces the stats)."""
        if not self.parallel_validation or n_traj <= 1:
            return None
        pid = jax.process_index()
        # the graph-partition training mesh axes mean "parts of one graph",
        # not trajectories — validation builds its own data-axis mesh;
        # chunks are assembled from host data placed device-by-device, so
        # every mesh device must be addressable from this process and the
        # mesh 1-axis (the Trainer only ever builds data-axis meshes)
        mesh = self.mesh if not self.graph_partition else None
        if mesh is not None and (
            len(mesh.axis_names) != 1
            or any(d.process_index != pid for d in mesh.devices.flat)
        ):
            mesh = None
        if mesh is None:
            if self._val_mesh is None:
                from jax.sharding import Mesh

                from graphphysics_tpu.parallel.mesh import DATA_AXIS

                local = jax.local_devices()
                if self.num_devices:
                    local = local[: self.num_devices]
                if len(local) <= 1:
                    return None
                self._val_mesh = Mesh(np.array(local), (DATA_AXIS,))
            mesh = self._val_mesh
        return mesh

    def _traj_chunks(self, dataset, traj_ids, group: int):
        """Per-rollout-chunk lists over the given trajectory ids (this
        host's share under multi-host validation). Size-bucketed datasets
        group chunks by bucket (same padded shapes) so mixed-size datasets
        still parallelize; metric accumulation is order-invariant sums.
        An int means the first N trajectories (single-host shorthand)."""
        if isinstance(traj_ids, int):
            traj_ids = range(traj_ids)
        traj_ids = list(traj_ids)
        if (
            group > 1
            and getattr(dataset, "num_buckets", 1) > 1
            and hasattr(dataset, "bucket_of_index")
        ):
            by_bucket: Dict[int, list] = {}
            for t in traj_ids:
                b = dataset.bucket_of_index(dataset.trajectory_indices(t)[0])
                by_bucket.setdefault(b, []).append(t)
            chunks = []
            for b in sorted(by_bucket):
                lst = by_bucket[b]
                chunks += [lst[i : i + group] for i in range(0, len(lst), group)]
            return chunks
        return [
            traj_ids[i : i + group] for i in range(0, len(traj_ids), group)
        ]

    def _traj_signature(self, dataset, traj: int):
        """Cheap can-these-trajectories-stack probe: frame count plus the
        first frame's pytree structure and leaf shapes (building one frame is
        ~T times cheaper than stacking the whole trajectory). Cached per
        (dataset, trajectory) — shapes are static for a fixed dataset, and
        rebuilding a full item per trajectory on EVERY validate would double
        the host-side validation I/O for nothing."""
        self._ensure_cache_owner(dataset)
        if traj in self._traj_sig_cache:
            return self._traj_sig_cache[traj]
        idx = dataset.trajectory_indices(traj)
        g = dataset[idx[0]]
        sig = (
            len(idx),
            jax.tree_util.tree_structure(g),
            tuple(np.shape(l) for l in jax.tree_util.tree_leaves(g)),
        )
        self._traj_sig_cache[traj] = sig
        return sig

    def _traj_stats(self, x0, node_mask, preds, targets, fetch_preds: bool):
        """Per-trajectory validation stats from device arrays: (rmse, count,
        val-loss sum, val-loss count, fetched predictions or None)."""
        nti = self.sim.config.node_type_index
        rmse = rollout_rmse(preds, targets, node_mask)
        t, _, d = preds.shape
        cnt = float(node_mask.sum()) * t * d
        vs, vc = 0.0, 0
        if self.K == 0:
            # per-step masked L2 on the denormalized rollout predictions
            # (reference "val_loss", lightning_module.py:225-232)
            node_type = x0[:, nti].astype(jnp.int32)
            step_losses = jax.vmap(
                lambda p, y: losses_mod.l2_loss(
                    y, p, node_type, self.masks, node_valid=node_mask
                )
            )(preds, targets)
            vs, vc = float(step_losses.sum()), int(step_losses.shape[0])
        return (
            float(rmse), cnt, vs, vc,
            np.asarray(preds) if fetch_preds else None,
        )

    def _device_stacked_chunk(self, stacks, mesh):
        """Assemble the ``[B, T, ...]`` chunk directly on the mesh: each
        trajectory's leaves are device_put to its own device and stitched
        into the global sharded array — the host never materializes the
        monolithic stack (peak host memory stays one trajectory)."""
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        devices = list(mesh.devices.flat)
        sharding = NamedSharding(mesh, PartitionSpec(axis))

        def build(*leaves):
            parts = [
                jax.device_put(np.asarray(l)[None], d)
                for l, d in zip(leaves, devices)
            ]
            return jax.make_array_from_single_device_arrays(
                (len(leaves),) + np.shape(leaves[0]), sharding, parts
            )

        return jax.tree_util.tree_map(build, *stacks)

    def _batched_chunk_rollout(self, variables, dataset, idxs, keys, mesh):
        """Batched rollout of the chunk's trajectories over the mesh's data
        axis; returns per-trajectory ``(x0, node_mask0, preds, targets)``
        device arrays, or None when the trajectories' padded shapes differ
        (caller falls back to sequential)."""
        from jax.sharding import NamedSharding, PartitionSpec

        from graphphysics_tpu.training.rollout import jitted_batched_rollout

        sig = self._traj_signature(dataset, idxs[0])
        for t in idxs[1:]:
            if self._traj_signature(dataset, t) != sig:
                return None

        group = mesh.devices.size
        valid = len(idxs)
        stacks = [self._stacked_trajectory(dataset, t) for t in idxs]
        keys = list(keys)
        while len(stacks) < group:  # pad the chunk; padded entries discarded
            stacks.append(stacks[-1])
            keys.append(keys[-1])
        batch = self._device_stacked_chunk(stacks, mesh)
        karr = jax.device_put(
            jnp.stack(keys),
            NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])),
        )
        rep = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec())
        )
        preds, targets = jitted_batched_rollout(
            self.sim,
            rep,
            batch,
            karr,
            use_previous_data=self.use_previous_data,
            previous_data_start=self.previous_data_start,
            previous_data_end=self.previous_data_end,
        )
        return [
            (batch.x[i, 0], batch.node_mask[i, 0], preds[i], targets[i])
            for i in range(valid)
        ]

    def _rollout_trajectories_parallel(self, variables, dataset, idxs, keys, mesh):
        chunk = self._batched_chunk_rollout(variables, dataset, idxs, keys, mesh)
        if chunk is None:
            return None
        return [
            self._traj_stats(x0, nm, p, t, fetch_preds=(traj == 0))
            for traj, (x0, nm, p, t) in zip(idxs, chunk)
        ]

    def _rollout_trajectory_partitioned(
        self, variables, val_dataset, traj, key, fetch_preds=None
    ):
        """One trajectory's rollout spread edge-partitioned over the graph
        mesh axis (``parallel.dp.partitioned_rollout``) — for meshes whose
        eval forward doesn't fit a single chip. Per-part budgets are the max
        over the trajectory's frames, so one compile serves all its steps."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from graphphysics_tpu.parallel.dp import partitioned_rollout
        from graphphysics_tpu.parallel.graph_partition import (
            partition_frames_np,
        )
        from graphphysics_tpu.parallel.mesh import GRAPH_AXIS

        stacked = self._stacked_trajectory(val_dataset, traj)
        leaves = jax.tree_util.tree_leaves(stacked)
        frames = [
            jax.tree_util.tree_map(lambda a, t=t: np.asarray(a)[t], stacked)
            for t in range(leaves[0].shape[0])
        ]
        csr = stacked.csr_bounds is not None
        perm = None
        if self.partition_reorder:
            # one permutation for the whole trajectory (frame-0 topology:
            # the base mesh adjacency; per-frame world edges only perturb
            # the boundary, and the node split must be frame-invariant)
            from graphphysics_tpu.parallel.reorder import permute_graph_np

            _, perm = self._maybe_reorder(frames[0])
            frames = [permute_graph_np(f, perm) for f in frames]
        parts = partition_frames_np(
            frames, self.graph_partition, halo=self.partition_mode == "halo",
            csr=csr, split_local=self._split_attention(),
        )
        if self.partition_mode == "halo" and self.halo_dtype is not None:
            parts = parts.replace(halo_dtype=self.halo_dtype)
        spec = P(None, GRAPH_AXIS)
        sharding = NamedSharding(self.mesh, spec)
        parts = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), parts
        )
        preds, targets = partitioned_rollout(
            self.sim, variables, parts, self.mesh, key,
            use_previous_data=self.use_previous_data,
            previous_data_start=self.previous_data_start,
            previous_data_end=self.previous_data_end,
        )
        if perm is not None:
            # map node-wise outputs back to the dataset's node order
            from graphphysics_tpu.parallel.reorder import inverse_permutation

            inv = jnp.asarray(inverse_permutation(perm))
            preds = preds[:, inv]
            targets = targets[:, inv]
        return self._traj_stats(
            jnp.asarray(np.asarray(stacked.x)[0]),
            jnp.asarray(np.asarray(stacked.node_mask)[0]),
            preds, targets,
            fetch_preds=(traj == 0) if fetch_preds is None else fetch_preds,
        )

    def _rollout_trajectory(self, variables, val_dataset, traj, key):
        frames = jax.device_put(self._stacked_trajectory(val_dataset, traj))
        preds, targets = jitted_rollout(
            self.sim,
            variables,
            frames,
            key,
            use_previous_data=self.use_previous_data,
            previous_data_start=self.previous_data_start,
            previous_data_end=self.previous_data_end,
        )
        return self._traj_stats(
            frames.x[0], frames.node_mask[0], preds, targets,
            fetch_preds=(traj == 0),
        )

    def validate(
        self,
        val_dataset,
        epoch: int = 0,
        max_trajectories: Optional[int] = None,
        save_rollout: bool = True,
    ) -> float:
        """Full autoregressive rollout over the validation trajectories;
        returns the global all-rollout RMSE (reference semantics: one RMSE
        over every step of every trajectory). With multiple devices the
        independent per-trajectory rollouts run batched over the data mesh
        axis (``jitted_batched_rollout``)."""
        variables = {
            "params": self.state["params"],
            "normalizer": self.state["normalizer"],
        }
        n_traj = val_dataset.size_dataset
        if max_trajectories is not None:
            n_traj = min(n_traj, max_trajectories)

        total_se, total_cnt = 0.0, 0.0
        vloss_sum, vloss_cnt = 0.0, 0
        # per-trajectory keys fold in the trajectory index, so the sampling
        # stream (GMM eval draws) is identical whatever the chunking — the
        # parallel and sequential paths agree even for stochastic heads
        base = jax.random.key(self.seed + epoch)
        part_val = bool(self.graph_partition and self.partitioned_validation)
        mesh = None if part_val else self._validation_mesh(n_traj)
        group = mesh.devices.size if mesh is not None else 1
        # multi-host: each process rolls out only its interleaved share of
        # the trajectories (the reference — and round 2 — duplicated ALL
        # rollouts per host); the (sum-of-squares, count) stats reduce
        # across hosts below. Partitioned validation is excluded: there
        # every host participates in every graph-sharded rollout.
        traj_ids = range(n_traj)
        multihost = jax.process_count() > 1 and not part_val
        if multihost:
            from graphphysics_tpu.parallel.multihost import (
                process_local_indices,
            )

            traj_ids = process_local_indices(n_traj).tolist()
        roll_one = (
            self._rollout_trajectory_partitioned
            if part_val
            else self._rollout_trajectory
        )

        from graphphysics_tpu.utils.progress import ProgressReporter

        prog = ProgressReporter(len(list(traj_ids)),
                                prefix=f"validate epoch {epoch}",
                                enable=self.progress)
        done = 0
        for idxs in self._traj_chunks(val_dataset, traj_ids, group):
            keys = [jax.random.fold_in(base, t) for t in idxs]
            results = None
            if len(idxs) > 1:
                results = self._rollout_trajectories_parallel(
                    variables, val_dataset, idxs, keys, mesh
                )
            if results is None:
                results = [
                    roll_one(variables, val_dataset, t, k)
                    for t, k in zip(idxs, keys)
                ]
            for t, (rmse, cnt, vs, vc, preds) in zip(idxs, results):
                total_se += rmse**2 * cnt
                total_cnt += cnt
                vloss_sum += vs
                vloss_cnt += vc
                if t == 0:
                    if save_rollout and self.rollout_dir:
                        self._save_rollout_xdmf(val_dataset, 0, preds, epoch)
                    if self.plot_callback is not None:
                        self.plot_callback(self, val_dataset, epoch, preds)
            done += len(idxs)
            prog.update(done)
        prog.close()
        if multihost:
            # order-invariant sums: the cross-host reduction reproduces the
            # single-process accumulation exactly (trajectory-0 export and
            # the plot callback already ran on the host owning trajectory 0)
            from jax.experimental import multihost_utils

            # gather the f64 stats LOSSLESSLY: process_allgather would
            # silently downcast float64 -> float32 with x64 off (precision
            # loss once counts exceed 2^24), so ship the raw bits as uint32
            # pairs and reduce in numpy f64 on the host
            local = np.asarray(
                [total_se, total_cnt, vloss_sum, float(vloss_cnt)],
                np.float64,
            )
            gathered_bits = np.asarray(
                multihost_utils.process_allgather(local.view(np.uint32))
            )
            stats = gathered_bits.view(np.float64).sum(axis=0)
            total_se, total_cnt, vloss_sum = stats[0], stats[1], stats[2]
            vloss_cnt = int(stats[3])
        # epoch-mean val_loss (None for GMM heads, as in the reference)
        self.last_val_loss = vloss_sum / vloss_cnt if vloss_cnt else None
        return float(np.sqrt(total_se / max(total_cnt, 1.0)))

    def _write_rollout_series(self, dataset, traj: int, preds: np.ndarray,
                              make_path):
        """Write a predicted trajectory as an XDMF time series on the raw
        mesh (reference ``_save_trajectory_to_xdmf``,
        ``lightning_module.py:124-161``); ``make_path(name)`` maps the
        trajectory's mesh id to the output path."""
        raw = dataset._load(dataset.trajectory_indices(traj)[0])
        cells = raw.tetra if raw.tetra is not None else raw.faces
        name = raw.id if raw.id else str(traj)
        dt = getattr(dataset, "dt", 1.0) or 1.0
        with XdmfTimeSeriesWriter(make_path(name)) as w:
            w.write_points_cells(raw.pos, cells)
            t = dt if not self.use_previous_data else 2 * dt
            for k in range(preds.shape[0]):
                w.write_data(t, {"prediction": preds[k, : raw.num_nodes]})
                t += dt

    def _save_rollout_xdmf(self, val_dataset, traj: int, preds: np.ndarray, epoch: int):
        try:
            save_dir = os.path.join(self.rollout_dir, f"epoch_{epoch}")
            os.makedirs(save_dir, exist_ok=True)
            self._write_rollout_series(
                val_dataset, traj, preds,
                lambda name: os.path.join(
                    save_dir, f"graph_epoch_{epoch}_{name}.xdmf"
                ),
            )
        except Exception as e:  # export must never kill training
            print(f"[trainer] rollout export failed: {e}")

    # ------------------------------------------------------------- predict

    def predict(
        self,
        dataset,
        save_dir: str = "predictions",
        max_trajectories: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Rollout every trajectory and save each as XDMF (reference
        ``predict_step`` / ``on_predict_epoch_end``,
        ``lightning_module.py:300-351``)."""
        variables = {
            "params": self.state["params"],
            "normalizer": self.state["normalizer"],
        }
        n_traj = dataset.size_dataset
        if max_trajectories is not None:
            n_traj = min(n_traj, max_trajectories)
        base = jax.random.key(self.seed)
        out: Dict[int, np.ndarray] = {}
        os.makedirs(save_dir, exist_ok=True)
        part_val = bool(self.graph_partition and self.partitioned_validation)
        mesh = None if part_val else self._validation_mesh(n_traj)
        group = mesh.devices.size if mesh is not None else 1

        for idxs in self._traj_chunks(dataset, range(n_traj), group):
            keys = [jax.random.fold_in(base, t) for t in idxs]
            chunk = None
            if len(idxs) > 1:
                chunk = self._batched_chunk_rollout(
                    variables, dataset, idxs, keys, mesh
                )
            if chunk is not None:
                preds_list = [np.asarray(p) for (_, _, p, _) in chunk]
            elif part_val:
                preds_list = [
                    self._rollout_trajectory_partitioned(
                        variables, dataset, t, k, fetch_preds=True
                    )[4]
                    for t, k in zip(idxs, keys)
                ]
            else:
                preds_list = []
                for t, k in zip(idxs, keys):
                    frames = jax.device_put(
                        self._stacked_trajectory(dataset, t)
                    )
                    preds, _ = jitted_rollout(
                        self.sim, variables, frames, k,
                        use_previous_data=self.use_previous_data,
                        previous_data_start=self.previous_data_start,
                        previous_data_end=self.previous_data_end,
                    )
                    preds_list.append(np.asarray(preds))
            for t, preds in zip(idxs, preds_list):
                out[t] = preds
                self._write_rollout_series(
                    dataset, t, preds,
                    lambda name: os.path.join(save_dir, f"graph_{name}.xdmf"),
                )
        return [out[t] for t in range(n_traj)]

    # ---------------------------------------------------------------- misc

    def save(self, epoch: int, batch_offset: Optional[int] = None):
        """End-of-epoch save (``batch_offset=None``: resume at epoch+1), or a
        mid-epoch preemption save (resume at this epoch, skipping the first
        ``batch_offset`` batches of its deterministic stream)."""
        path = os.path.join(self.checkpoint_dir, self.checkpoint_name)
        metadata = {
            "epoch": epoch + 1 if batch_offset is None else epoch,
            "step": int(self.state["step"]),
            "wandb_run_id": getattr(self.extra_logger, "run_id", None),
        }
        if batch_offset is not None:
            metadata["batch_offset"] = int(batch_offset)
        save_checkpoint(
            path, self.state, metadata=metadata,
            backend=self.checkpoint_backend,
        )

    def _log(self, epoch: int, step: int, metrics: Dict[str, float]):
        if self.metrics is not None:
            self.metrics.log(epoch, step, metrics)
        if self.extra_logger is not None:
            self.extra_logger.log(metrics, step=step)
