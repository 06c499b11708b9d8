"""Persistent XLA compile cache.

One switch for every entry point (tests/conftest.py, bench.py,
scripts/profile_stages.py): the remote-compile tunnel in this
environment is slow and occasionally queues for minutes, while cached
programs load in seconds. Entries are keyed by program + target, so a
stale cache is only ever a miss (CPU AOT entries from a different host
machine log a feature-mismatch error and fall back to recompile —
BENCH_NOTES.md "Suite cost").
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the repo-local
    ``.xla_cache`` (gitignored) and lower the write thresholds so even
    small programs persist. Idempotent; returns the directory."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
