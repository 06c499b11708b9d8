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
