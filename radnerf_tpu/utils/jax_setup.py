"""JAX runtime setup helpers shared by entry points and tests."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent XLA compilation cache so repeated runs (tests,
    benches, trainers) skip recompiles. Safe to call multiple times."""
    import jax

    cache_dir = path or os.environ.get(
        "RADNERF_COMPILE_CACHE", os.path.expanduser("~/.cache/radnerf_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
