"""Bitwise determinism self-checks.

The reference has no race detection or sanitizers (SURVEY.md §5); its
closest concern is h5py thread-unsafety, handled by forcing single-worker
loading. This framework makes stronger promises — deterministic per-(seed,
epoch, index) items, bit-identical mid-epoch resume, grouping-invariant
validation — and those promises are only as good as their checks. This
module provides the checks as first-class utilities:

- ``check_item_determinism``: a dataset item rebuilt twice must be bitwise
  identical (the contract the exact-resume machinery relies on).
- ``check_step_determinism``: a jitted train step replayed from cloned
  state/batch must produce bitwise-identical state (XLA on TPU is
  deterministic given identical inputs; a mismatch means nondeterminism
  crept in — host RNG in the step, time-dependent input, or a
  non-reproducible reduction on another backend).

Both return a report rather than asserting, so they can run in production
sanity sweeps and in tests alike.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import numpy as np


def _leaf_paths(tree) -> List[tuple]:
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return flat


def _clone(tree):
    """Deep-copy a pytree onto fresh device buffers (safe to pass to a
    donating step function)."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a)), tree
    )


def _compare(tree_a, tree_b) -> List[str]:
    import jax

    # structure first: zipping flattened leaves would silently truncate on
    # extra/missing leaves and pair the rest against the wrong paths
    struct_a = jax.tree_util.tree_structure(tree_a)
    struct_b = jax.tree_util.tree_structure(tree_b)
    if struct_a != struct_b:
        return [f"tree structure differs: {struct_a} != {struct_b}"]
    mismatches = []
    a_flat = _leaf_paths(tree_a)
    b_flat = _leaf_paths(tree_b)
    for (path_a, leaf_a), (_, leaf_b) in zip(a_flat, b_flat):
        arr_a, arr_b = np.asarray(leaf_a), np.asarray(leaf_b)
        if arr_a.shape != arr_b.shape or arr_a.dtype != arr_b.dtype:
            mismatches.append(jax.tree_util.keystr(path_a) + " (shape/dtype)")
        elif arr_a.tobytes() != arr_b.tobytes():
            mismatches.append(jax.tree_util.keystr(path_a))
    return mismatches


def check_item_determinism(dataset, index: int = 0) -> Dict[str, Any]:
    """Rebuild item ``index`` twice; report any leaf that differs bitwise."""
    mismatches = _compare(dataset[index], dataset[index])
    return {"deterministic": not mismatches, "mismatches": mismatches}


def check_step_determinism(
    step_fn: Callable, state, batch, runs: int = 2
) -> Dict[str, Any]:
    """Replay ``step_fn(state, batch)`` ``runs`` times from cloned inputs;
    report any state leaf or auxiliary output that differs bitwise between
    runs. ``step_fn`` may donate its first argument — every call gets a
    fresh clone."""
    outs = []
    for _ in range(runs):
        outs.append(step_fn(_clone(state), _clone(batch)))
    mismatches: List[str] = []
    for other in outs[1:]:
        mismatches.extend(
            m for m in _compare(outs[0], other) if m not in mismatches
        )
    return {"deterministic": not mismatches, "mismatches": mismatches}
