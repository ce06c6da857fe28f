"""Checkpoint save/restore.

Replaces the reference's two mechanisms (Lightning ``ModelCheckpoint`` +
``Simulator.save_checkpoint``, ``graphphysics/models/simulator.py:356-405``)
with one: the full training state pytree — params, the three normalizers'
running statistics, optimizer state, step/epoch — saved as msgpack of the
flattened leaves (robust to custom pytree nodes like ``NormalizerState``),
restored against a template with the same treedef, plus a JSON metadata
sidecar. The normalizer statistics surviving checkpointing is load-bearing
(reference ``layers.py:300-313``).

Backends: ``"msgpack"`` (default — one portable file, understood by the
reference-checkpoint importer machinery) or ``"orbax"`` / ``"orbax-async"``
(directory-based; async saves return immediately so periodic mid-epoch
checkpoints don't stall the step loop, and orbax natively coordinates
multi-host sharded state). ``load_checkpoint`` auto-detects all formats.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax.serialization import msgpack_restore, msgpack_serialize

_ASYNC_CKPTR = None  # lazily-created module-global orbax AsyncCheckpointer
_PENDING_SWAPS: list = []  # (staged_dir, final_dir) awaiting async commit


def _orbax(async_: bool):
    import orbax.checkpoint as ocp

    if async_:
        global _ASYNC_CKPTR
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(
                ocp.CompositeCheckpointHandler()
            )
        return ocp, _ASYNC_CKPTR
    return ocp, ocp.Checkpointer(ocp.CompositeCheckpointHandler())


def require_backend(backend: str) -> None:
    """Validate a checkpoint backend up front (the Trainer calls this in
    ``__init__``) so a missing optional orbax dependency fails at startup,
    not after the first epoch of compute."""
    if backend in ("orbax", "orbax-async"):
        import orbax.checkpoint  # noqa: F401
    elif backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")


def _swap_into_place(staged: str, final: str) -> None:
    """Promote a fully-committed staged checkpoint dir to the live path.
    The only window where ``final`` is missing leaves a complete ``staged``
    (or ``.old``) dir behind, which ``_resolve_orbax_dir`` recovers."""
    import shutil

    old = final + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(staged, final)
    if os.path.exists(old):
        shutil.rmtree(old)


def wait_for_async_saves() -> None:
    """Block until every in-flight ``orbax-async`` save has committed and
    swap the staged dirs live (call before process exit; the Trainer does
    this at the end of ``fit``)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    while _PENDING_SWAPS:
        staged, final = _PENDING_SWAPS.pop(0)
        if os.path.isdir(staged):
            _swap_into_place(staged, final)


def _resolve_orbax_dir(path: str) -> Optional[str]:
    """Newest complete checkpoint dir for ``path``: a committed-but-unswapped
    ``.next`` stage wins (it is strictly newer), then the live path, then a
    ``.old`` left by a crash between the two renames. Orbax commits a
    directory only by renaming its internal tmp into place, so a dir
    existing at any of these names is complete."""
    for cand in (path + ".next", path, path + ".old"):
        if os.path.isdir(cand):
            return cand
    return None


def save_checkpoint(
    path: str,
    state: Any,
    metadata: Optional[dict] = None,
    backend: str = "msgpack",
):
    """Atomic save: a preemption mid-write never corrupts the previous
    checkpoint — the recovery story the reference lacks (its failure
    handling is manual restart, SURVEY.md §5). msgpack: write-temp +
    ``os.replace``. orbax: stage into ``path.next`` (orbax itself finalizes
    by rename), then swap the stage live — never ``force=True`` on the live
    path, which would rmtree the previous checkpoint before the new one
    commits."""
    if backend in ("orbax", "orbax-async"):
        import shutil

        ocp, ckptr = _orbax(backend == "orbax-async")
        final = os.path.abspath(path)
        staged = final + ".next"
        if backend == "orbax-async":
            # drain the previous in-flight save before reusing the stage
            wait_for_async_saves()
        if os.path.exists(staged):
            shutil.rmtree(staged)  # stale stage from a crashed run
        ckptr.save(
            staged,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metadata=ocp.args.JsonSave(metadata or {}),
            ),
        )
        if backend == "orbax-async":
            _PENDING_SWAPS.append((staged, final))
        else:
            _swap_into_place(staged, final)
        return
    if backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    leaves = jax.tree_util.tree_leaves(state)
    payload = {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}
    if metadata is not None:
        # metadata rides INSIDE the state file so one os.replace commits both
        # atomically — a crash between two separate replaces would pair new
        # state with the previous save's metadata (stale batch_offset =>
        # resume silently replays batches into already-updated params)
        payload["__metadata__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(msgpack_serialize(payload))
    os.replace(tmp, path)
    if metadata is not None:
        # advisory human-readable sidecar (load_metadata prefers the embedded
        # copy; the sidecar may lag by one save after a crash)
        tmp_meta = path + ".meta.json.tmp"
        with open(tmp_meta, "w") as f:
            json.dump(metadata, f)
        os.replace(tmp_meta, path + ".meta.json")


def is_torch_checkpoint(path: str) -> bool:
    """True if ``path`` is a reference (PyTorch) checkpoint: a zip archive
    (modern ``torch.save``) or a pickle stream (legacy format)."""
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic == b"PK" or (len(magic) == 2 and magic[0] == 0x80 and magic[1] < 0x10)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (a freshly-initialized
    state pytree with matching shapes/treedef).

    Reference PyTorch checkpoints (``Simulator.save_checkpoint``,
    ``graphphysics/models/simulator.py:379-405``) are detected by file magic
    and imported via ``utils.torch_import``: params + normalizer statistics
    are taken from the torch file; optimizer state / step counters keep the
    template's (fresh) values.
    """
    wait_for_async_saves()  # an in-flight async save may be this path
    orbax_dir = _resolve_orbax_dir(path)
    if orbax_dir is not None:  # orbax checkpoint directory
        ocp, ckptr = _orbax(async_=False)
        restored = ckptr.restore(
            os.path.abspath(orbax_dir),
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )
        return restored["state"]

    if is_torch_checkpoint(path):
        from graphphysics_tpu.utils.torch_import import import_reference_checkpoint

        imported = import_reference_checkpoint(
            path,
            {"params": template["params"], "normalizer": template["normalizer"]},
        )
        out = dict(template)
        out["params"] = imported["params"]
        out["normalizer"] = imported["normalizer"]
        return out

    with open(path, "rb") as f:
        payload = msgpack_restore(f.read())
    payload.pop("__metadata__", None)
    return _unflatten_payload(payload, template)


def _unflatten_payload(payload: dict, template: Any):
    """Validate a ``{str(i): leaf}`` msgpack payload against the template's
    treedef and unflatten — shared by both load paths so a future fix to
    one cannot miss the other."""
    treedef = jax.tree_util.tree_structure(template)
    n = treedef.num_leaves
    if len(payload) != n:
        raise ValueError(
            f"checkpoint has {len(payload)} leaves, template expects {n}"
        )
    leaves = [payload[str(i)] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint_with_metadata(path: str, template: Any) -> tuple:
    """``(state, metadata)`` with ONE disk read/parse for the msgpack
    backend — ``load_checkpoint`` + ``load_metadata`` would deserialize the
    full state payload (potentially hundreds of MB of params + optimizer
    moments) twice. Orbax / torch files fall back to the two-call path
    (orbax restores state and metadata as separate items anyway)."""
    wait_for_async_saves()
    if (
        _resolve_orbax_dir(path) is not None
        or not os.path.exists(path)
        or is_torch_checkpoint(path)
    ):
        return load_checkpoint(path, template), load_metadata(path)
    with open(path, "rb") as f:
        payload = msgpack_restore(f.read())
    embedded = payload.pop("__metadata__", None)
    if embedded is not None:
        metadata = json.loads(np.asarray(embedded).tobytes().decode())
    else:
        meta_path = path + ".meta.json"
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
    return _unflatten_payload(payload, template), metadata


def load_metadata(path: str, prefer_sidecar: bool = False) -> dict:
    """``prefer_sidecar=True`` returns the ``.meta.json`` sidecar without
    parsing the state file at all — the embedded copy is the atomically
    committed one, but extracting it deserializes EVERY params/optimizer
    leaf; for advisory reads (e.g. a W&B run id before the trainer's own
    single-parse resume) the sidecar's tiny crash-staleness window is the
    right trade."""
    wait_for_async_saves()
    if prefer_sidecar and os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            return json.load(f)
    orbax_dir = _resolve_orbax_dir(path)
    if orbax_dir is not None:  # orbax checkpoint directory
        ocp, ckptr = _orbax(async_=False)
        restored = ckptr.restore(
            os.path.abspath(orbax_dir),
            args=ocp.args.Composite(metadata=ocp.args.JsonRestore()),
        )
        return dict(restored["metadata"] or {})
    # prefer the copy embedded in the state file (committed atomically with
    # the state); fall back to the sidecar for older checkpoints
    if os.path.exists(path) and not is_torch_checkpoint(path):
        with open(path, "rb") as f:
            payload = msgpack_restore(f.read())
        embedded = payload.get("__metadata__")
        if embedded is not None:
            return json.loads(np.asarray(embedded).tobytes().decode())
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
