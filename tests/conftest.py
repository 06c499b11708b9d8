"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is tested on virtual CPU devices so the suite
runs anywhere and deterministically (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

The environment pins JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
pre-imports jax, so the env var alone is not enough — we must also flip
the config knob before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is dominated by CPU compiles
# of full VGG/ResNet training graphs (a cold run is ~25 min on this
# 1-core host). Caching compiled executables across runs cuts warm runs
# to the execution-only time. The cache lives in the repo (gitignored)
# so it survives across sessions.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
