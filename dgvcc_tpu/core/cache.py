"""Persistent XLA compile cache.

One switch for every entry point (tests/conftest.py, bench.py,
scripts/profile_stages.py, CLI `compile_cache:`): the remote-compile
tunnel in this environment is slow and occasionally queues for minutes,
while cached programs load in seconds.

Cross-host caveat (observed 2026-08-18): CPU AOT entries compiled on a
DIFFERENT host usually log a feature-mismatch error and fall back to
recompile, but entries whose feature delta the loader tolerates can
EXECUTE with slightly different instruction selection — enough to shift
f32 results at the 4th decimal and fail bit-level lockstep tests. If
the machine changes under a cached workspace, delete the cache dir; the
cpu_aot_loader "prefer-no-gather/scatter" error spam itself is benign.
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
