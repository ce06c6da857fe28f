"""Shared helpers for the fidelity benchmark scripts (cylinder / plate /
aneurysm / panels): held-out split generation, cross-split static-budget
unification, and the persistence context baseline."""

from __future__ import annotations

import copy
import os
import shutil

import numpy as np


def write_heldout_split(write_fn, train_dir: str, test_dir: str, **val_kwargs):
    """Generate a held-out split with ``write_fn(dir, **val_kwargs)`` into a
    scratch dir and move the trajectory files into ``test_dir`` — keeps the
    generator's own file naming while the train dir stays untouched.
    Returns ``test_dir``."""
    tmp_dir = train_dir.rstrip("/") + ".heldout_tmp"
    write_fn(tmp_dir, **val_kwargs)
    os.makedirs(test_dir, exist_ok=True)
    for f in os.listdir(tmp_dir):
        if f.endswith((".xdmf", ".h5")):
            shutil.move(os.path.join(tmp_dir, f), os.path.join(test_dir, f))
    shutil.rmtree(tmp_dir)
    return test_dir


def val_param_for(param: dict, test_path: str) -> dict:
    """A copy of the training config pointing at the held-out data —
    explicit, instead of ``switch_to_val``'s ``train→test`` path substring
    rewrite (which corrupts any workdir containing 'train')."""
    val_param = copy.deepcopy(param)
    key = "xdmf_folder" if param["dataset"]["extension"] == "xdmf" else "h5_path"
    val_param["dataset"][key] = test_path
    return val_param


def unify_budgets(train_ds, val_ds) -> None:
    """Unify static padded shapes to the max over both splits (the CLI's
    contract: a val trajectory may be larger than every train trajectory)."""
    _ = train_ds[0]
    _ = val_ds[0]
    nb = max(train_ds.node_budget, val_ds.node_budget)
    eb = max(train_ds.edge_budget or 0, val_ds.edge_budget or 0) or None
    train_ds.node_budget = val_ds.node_budget = nb
    train_ds.edge_budget = val_ds.edge_budget = eb
    if (
        getattr(train_ds, "edge_layout", "coo") == "csr"
        or getattr(val_ds, "edge_layout", "coo") == "csr"
    ):
        # re-derive the kernel chunk budgets under the unified shapes and
        # share the max (same contract as cli/train.py)
        train_ds.csr_max_chunks = val_ds.csr_max_chunks = None
        _ = train_ds[0]
        _ = val_ds[0]
        mc = max(train_ds.csr_max_chunks or 0, val_ds.csr_max_chunks or 0)
        train_ds.csr_max_chunks = val_ds.csr_max_chunks = mc


def persistence_rmse(val_ds, field_slice, node_type_col: int) -> float:
    """Frozen-field persistence baseline with the real rollout metric's
    semantics (``training/rollout.py``): predictions on NOT(NORMAL|OUTFLOW)
    nodes are clamped to ground truth (zero error), so only NORMAL and
    OUTFLOW nodes accrue error; the denominator counts ALL valid nodes
    (``rollout_rmse``)."""
    from graphphysics_tpu.core.nodetype import NodeType

    lo, hi = field_slice
    se_sum, cnt = 0.0, 0.0
    for tr in range(val_ds.size_dataset):
        frames = [val_ds[i] for i in val_ds.trajectory_indices(tr)]
        f0 = frames[0].x[:, lo:hi]
        valid = frames[0].node_mask.astype(bool)
        nt = frames[0].x[:, node_type_col]
        unclamped = valid & (
            (nt == float(NodeType.NORMAL)) | (nt == float(NodeType.OUTFLOW))
        )
        for f in frames:
            se_sum += float(((f0 - f.y[:, : hi - lo]) ** 2)[unclamped].sum())
            cnt += float(valid.sum()) * (hi - lo)
    return float(np.sqrt(se_sum / cnt))
