"""Persistent XLA compilation cache.

TPU compiles of the jitted train step and especially the whole-trajectory
rollout scan take minutes (CLAUDE.md); JAX can cache compiled executables
on disk and reuse them across processes — restarts, preemption resumes, and
multi-epoch predict runs then skip straight to execution. The reference has
no analog (PyTorch eager pays no compile). Off by default because the cache
directory choice belongs to the user; enable via ``--compilation_cache_dir``
on the CLIs or this function.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    cache_dir: str, min_compile_time_secs: float = 1.0
) -> None:
    """Enable JAX's persistent compilation cache rooted at ``cache_dir``.

    Safe to call before or after other jax imports, but must run before the
    first compilation to benefit it. Caches everything that takes >=
    ``min_compile_time_secs`` to compile (the stock default would skip
    small-but-recompiled steps)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    # cache regardless of entry size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
