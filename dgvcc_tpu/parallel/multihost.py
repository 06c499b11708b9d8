"""Multi-host (pod-scale) data-parallel glue.

On a TPU pod each process owns only its local chips; the global mesh
spans every process and a jitted shard_map step runs SPMD across all
of them. The only extra machinery a pod run needs over the single-host
path (parallel/mesh.py) is:

  * a **global mesh** over ``jax.devices()`` (all processes) —
    :func:`global_mesh`;
  * **per-host disjoint data**: each process loads its own slice of the
    global batch and assembles a global sharded array without any
    cross-host transfer — :func:`host_shard_batch` wraps
    ``jax.make_array_from_process_local_data``;
  * a **deterministic cross-host sampler** so the per-host slices
    partition the dataset exactly (the torch DistributedSampler role —
    the reference is single-process and has none) —
    :class:`DistributedSampler`.

Single-process (tests, the virtual CPU mesh) is the degenerate case:
process_count == 1 makes host_shard_batch equivalent to
mesh.shard_batch, which is asserted in tests/test_multihost.py.

Bootstrap on a real pod: call ``jax.distributed.initialize()`` (env-
driven on Cloud TPU) before touching devices, then build the trainer
normally — `mesh: {data: N}` with N = total chip count.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgvcc_tpu.parallel.mesh import DATA_AXIS, _REPLICATED_PREFIX


def initialize_distributed(**kwargs) -> None:
    """``jax.distributed.initialize`` with two benign cases tolerated:
    already initialized, and a plain single-process run (no coordinator
    configured anywhere). A real bootstrap failure on a configured pod
    (bad coordinator address, process-count mismatch) propagates —
    silently degrading a pod job to single-host would train on 1/Nth of
    the fleet with no error until the results look wrong."""
    import os

    configured = kwargs.get("coordinator_address") or any(
        os.environ.get(k) for k in
        ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
         "CLOUD_TPU_TASK_ID", "TPU_WORKER_HOSTNAMES"))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
    except ValueError:
        if configured:
            raise  # pod was configured — surface the real failure


def global_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over ALL processes' devices (jax.devices() is
    global after jax.distributed.initialize)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def host_shard_batch(mesh: Mesh, host_batch: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble global arrays from per-process local batches.

    ``host_batch`` holds THIS process's rows only — the PER-HOST batch
    (the YAML ``batch_size``, matching torch's per-process DataLoader
    convention; the global batch is process_count x that, so per-config
    dynamics scale with pod size exactly as they do in the torch
    ecosystem). Keys with the ``isw_`` replicated prefix are
    placed replicated like parallel/mesh.py does — the CALLER must pass
    IDENTICAL values on every process (replicated placement from local
    data is undefined otherwise; sync per-host ISW tracker stats with
    :func:`allgather_sum` before deriving the masks). No cross-host
    data movement happens — each host's shards stay on its chips.
    """
    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    repl_sharding = NamedSharding(mesh, P())
    out = {}
    for k, v in host_batch.items():
        v = np.asarray(v)
        if k.startswith(_REPLICATED_PREFIX):
            out[k] = jax.make_array_from_process_local_data(repl_sharding, v)
        else:
            out[k] = jax.make_array_from_process_local_data(data_sharding, v)
    return out


def allgather_sum(tree):
    """Sum a pytree of host-local numpy arrays across all processes.

    The pod-correct way to merge per-host ISW covariance-tracker
    statistics (models/whitening.py::IswCovTracker.add accumulates sums,
    so summing across hosts equals single-host accumulation over the
    global batch): every host calls this with its local sums and gets
    identical global sums back — after which the derived ``isw_`` masks
    are identical on every process, satisfying host_shard_batch's
    replication contract. Single-process: identity.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)  # leading P axis
    return jax.tree.map(lambda x: np.asarray(x).sum(axis=0), gathered)


def allgather_mean(tree):
    """Mean of a pytree of host-local numpy arrays across processes.

    For statistics every host accumulated over the SAME data (e.g. the
    ISW tracker's full-val-set sums — val loaders are never
    sampler-sharded), the mean is a logical no-op that enforces
    bitwise-identical values on every host (per-host float
    nondeterminism would otherwise leak into the derived masks).
    Single-process: identity.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    p = jax.process_count()
    gathered = multihost_utils.process_allgather(tree)
    return jax.tree.map(lambda x: np.asarray(x).sum(axis=0) / p, gathered)


class DistributedSampler:
    """Deterministic per-host index slices that partition the dataset.

    Epoch ``e`` shuffles indices with fold_in(seed, e) (matching the
    per-epoch reseed discipline of data/loader.py), pads to a multiple
    of world_size x batch_size by wrapping (every host sees the same
    length — a requirement for SPMD lockstep), and hands host ``rank``
    the strided slice ``rank::world_size``.
    """

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True,
                 rank: Optional[int] = None,
                 world_size: Optional[int] = None):
        self.n = int(n)
        self.batch_size = int(batch_size)  # PER-HOST batch size
        self.seed = int(seed)
        self.shuffle = shuffle
        self.rank = jax.process_index() if rank is None else rank
        self.world_size = jax.process_count() if world_size is None else world_size
        if not (0 <= self.rank < self.world_size):
            raise ValueError(f"rank {self.rank} outside world {self.world_size}")
        if self.batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {self.batch_size}")

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """This host's sample indices for ``epoch``, grouped per batch."""
        idx = np.arange(self.n, dtype=np.int64)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch]))
            rng.shuffle(idx)
        stride = self.world_size * self.batch_size
        total = max(1, -(-self.n // stride)) * stride  # ceil, >= 1 batch
        if total > self.n:  # wrap-pad (tiling) so every host runs equal steps
            idx = np.resize(idx, total)
        return idx[self.rank::self.world_size]

    def __len__(self) -> int:  # batches per epoch (identical on all hosts)
        stride = self.world_size * self.batch_size
        return max(1, -(-self.n // stride))


def all_hosts_partition(samplers: Sequence[DistributedSampler],
                        epoch: int) -> np.ndarray:
    """Test/verification helper: the union of every host's indices for
    one epoch, in global batch order (host-interleaved)."""
    per_host = [s.epoch_indices(epoch) for s in samplers]
    return np.stack(per_host, axis=1).reshape(-1)
