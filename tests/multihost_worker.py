"""Worker process for tests/test_multihost.py::test_two_process_dp_step.

Run as: python multihost_worker.py <rank> <port>

Joins a 2-process jax.distributed world (4 virtual CPU devices per
process -> 8 global), assembles its HALF of a deterministic global
batch via parallel/multihost.py::host_shard_batch (the real
``jax.make_array_from_process_local_data`` cross-process path — the
thing the single-process degenerate tests cannot exercise), runs ONE
data-parallel train step on the tiny-geometry DG 'base' model, and
prints the loss for the parent to compare against the single-process
result.
"""

import os
import sys


def main():
    rank, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from dgvcc_tpu.core.registry import LOSSES, MODELS
    import dgvcc_tpu.losses  # noqa: F401
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.parallel import build_parallel_train_step
    from dgvcc_tpu.parallel.mesh import replicate
    from dgvcc_tpu.parallel.multihost import (DistributedSampler, global_mesh,
                                              host_shard_batch)
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.state import create_train_state

    mesh = global_mesh(8)
    from dgvcc_tpu.testing import TINY  # shared with the parent test

    model = MODELS.build("base", **TINY)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = build_parallel_train_step(model, loss, "simple", 1000.0, mesh,
                                     donate=False)

    # both processes derive the SAME global batch, then keep their half:
    # the per-host rows a DistributedSampler(shuffle=False) would assign
    rng = np.random.default_rng(7)
    g_img = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    g_dmap = rng.uniform(0, 0.01, (8, 32, 32, 1)).astype(np.float32)
    sampler = DistributedSampler(8, 4, shuffle=False, rank=rank, world_size=2)
    mine = sampler.epoch_indices(0)
    gbatch = host_shard_batch(mesh, {"img1": g_img[mine],
                                     "dmap": g_dmap[mine]})

    state = replicate(mesh, state)
    _, metrics = step(state, gbatch, jax.random.PRNGKey(2), jnp.int32(0))
    print(f"RESULT rank={rank} loss={float(metrics['loss_total'])!r} "
          f"rows={mine.tolist()}", flush=True)


if __name__ == "__main__":
    main()
