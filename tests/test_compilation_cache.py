"""Persistent XLA compilation cache wiring (utils/compilation_cache.py)."""

import os


def test_enable_compilation_cache_persists_executables(tmp_path):
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    saved = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    cache_dir = str(tmp_path / "xla_cache")
    try:
        enable_compilation_cache(cache_dir, min_compile_time_secs=0.0)

        @jax.jit
        def f(x):
            return (x @ x).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        assert os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) > 0
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)
