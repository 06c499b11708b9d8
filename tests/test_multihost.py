"""Pod-scale glue (parallel/multihost.py) on the virtual 8-device mesh.

Single-process degenerate case: host_shard_batch must place arrays
exactly like mesh.shard_batch; the sampler math is exercised for
simulated multi-host worlds (pure host-side logic, no pod needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvcc_tpu.parallel import make_mesh, shard_batch
from dgvcc_tpu.parallel.multihost import (
    DistributedSampler,
    all_hosts_partition,
    global_mesh,
    host_shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh")


def test_host_shard_batch_matches_shard_batch():
    mesh = global_mesh(8)
    rng = np.random.default_rng(0)
    batch = {"img1": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
             "isw_mask": rng.normal(size=(4, 4)).astype(np.float32)}
    a = host_shard_batch(mesh, batch)
    b = shard_batch(make_mesh(8), {"img1": jnp.asarray(batch["img1"])})
    np.testing.assert_array_equal(np.asarray(a["img1"]), np.asarray(b["img1"]))
    # data keys sharded over the axis; isw_ consts replicated (mesh.py's
    # shard_batch can't place them — their dim0 need not divide the mesh)
    np.testing.assert_array_equal(np.asarray(a["isw_mask"]), batch["isw_mask"])
    assert a["img1"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert a["isw_mask"].sharding.spec == jax.sharding.PartitionSpec()


def test_host_sharded_batch_drives_parallel_step():
    """A train step consumes a host-assembled global batch unchanged."""
    from dgvcc_tpu.core.registry import MODELS, LOSSES
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.losses  # noqa: F401
    from dgvcc_tpu.parallel import build_parallel_train_step
    from dgvcc_tpu.parallel.mesh import replicate
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.state import create_train_state

    mesh = global_mesh(8)
    model = MODELS.build("base")
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = build_parallel_train_step(model, loss, "simple", 1000.0, mesh,
                                     donate=False)
    rng = np.random.default_rng(1)
    batch = {"img1": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
             "dmap": rng.uniform(0, 0.01, (8, 32, 32, 1)).astype(np.float32)}
    gbatch = host_shard_batch(mesh, batch)
    state = replicate(mesh, state)
    _, metrics = step(state, dict(gbatch), jax.random.PRNGKey(2), jnp.int32(0))
    assert np.isfinite(float(metrics["loss_total"]))


def _world(n, batch, world, seed=3, shuffle=True):
    return [DistributedSampler(n, batch, seed=seed, shuffle=shuffle,
                               rank=r, world_size=world)
            for r in range(world)]


def test_sampler_partitions_exactly():
    n, batch, world = 103, 4, 4
    samplers = _world(n, batch, world)
    per_host = [s.epoch_indices(5) for s in samplers]
    lens = {len(p) for p in per_host}
    assert len(lens) == 1  # SPMD lockstep: equal steps everywhere
    assert len(samplers[0]) * batch == len(per_host[0])
    union = np.concatenate(per_host)
    # every sample covered; wrap-padding repeats only
    assert set(union.tolist()) == set(range(n))
    # first n draws (before padding) are a permutation
    allidx = all_hosts_partition(samplers, 5)
    assert sorted(allidx[:n].tolist()) == list(range(n))


def test_sampler_epoch_reshuffles_deterministically():
    s = DistributedSampler(50, 5, seed=9, rank=0, world_size=2)
    e0, e1 = s.epoch_indices(0), s.epoch_indices(1)
    assert not np.array_equal(e0, e1)
    np.testing.assert_array_equal(e0, s.epoch_indices(0))
    # no shuffle → strided deterministic order
    s2 = _world(10, 5, 1, shuffle=False)[0]
    np.testing.assert_array_equal(s2.epoch_indices(0), np.arange(10))


def test_dataloader_with_sampler_partitions_epoch():
    """DataLoader(sampler=...) iterates only this host's slice; two
    simulated hosts together cover the dataset with equal batch counts."""
    from dgvcc_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 21

        def __getitem__(self, i, rng=None):
            return {"i": i}

        @staticmethod
        def collate(samples):
            return [s["i"] for s in samples]

    seen = []
    lens = []
    for rank in range(2):
        s = DistributedSampler(21, 4, seed=5, rank=rank, world_size=2)
        dl = DataLoader(DS(), batch_size=4, shuffle=True, sampler=s)
        dl.set_epoch(3)
        batches = list(dl)
        lens.append(len(batches))
        assert len(batches) == len(dl)
        seen.extend(i for b in batches for i in b)
    assert lens[0] == lens[1]
    assert set(seen) == set(range(21))  # full coverage across hosts


def test_allgather_sum_single_process_identity():
    from dgvcc_tpu.parallel.multihost import allgather_mean, allgather_sum

    tree = {"a": np.arange(6.0).reshape(2, 3), "b": np.float32(3.5)}
    for fn in (allgather_sum, allgather_mean):
        out = fn(tree)
        np.testing.assert_array_equal(out["a"], tree["a"])
        assert out["b"] == tree["b"]


def test_dataloader_rejects_mismatched_sampler_batch_size():
    from dgvcc_tpu.data.loader import DataLoader

    s = DistributedSampler(10, 4, rank=0, world_size=1)
    with pytest.raises(ValueError, match="batch_size"):
        DataLoader(object(), batch_size=8, sampler=s,
                   collate=lambda x: x)


def test_sampler_tiny_dataset_wraps():
    samplers = _world(3, 2, 4)  # n < world*batch
    per_host = [s.epoch_indices(0) for s in samplers]
    assert all(len(p) == 2 for p in per_host)
    assert set(np.concatenate(per_host).tolist()) == {0, 1, 2}
