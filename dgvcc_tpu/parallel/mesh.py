"""Device-mesh data parallelism.

The reference's only multi-device communication is torch.distributed
all_reduce of whitening statistics (models/ISW/sync_switchwhiten.py) and
SyncBatchNorm; gradients were never synced because training was
single-GPU. Here data parallelism is first-class: the train step runs
under shard_map over a 1-D 'data' mesh axis, with

  * gradients        → lax.pmean  (DDP equivalent)
  * batch statistics → lax.pmean  (SyncBN / SyncSwitchWhiten equivalent)
  * metrics          → lax.pmean

All collectives ride ICI; XLA chooses the all-reduce algorithm.
Params/opt state are replicated; batches are sharded on axis 0.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dgvcc_tpu.train.steps import build_train_step

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place host batch arrays sharded along the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def build_parallel_train_step(
    model, loss, mode: str, log_para: float, mesh: Mesh, donate: bool = True
) -> Callable:
    """shard_map-wrapped train step: per-shard fwd/bwd + pmean sync.

    Input batch must be sharded on axis 0 over the data axis (use
    :func:`shard_batch`); state is replicated. Returns a jitted callable
    (state, batch, rng, epoch) → (state, metrics).
    """
    per_shard = build_train_step(model, loss, mode, log_para, axis_name=DATA_AXIS)

    def wrapped(state, batch, rng, epoch):
        # same dropout key on every shard would correlate noise; fold in
        # the shard index
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, idx)
        return per_shard(state, batch, rng, epoch)

    state_spec = P()  # replicated
    batch_spec = P(DATA_AXIS)

    sm = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec, state_spec),
        out_specs=(state_spec, state_spec),
    )
    return jax.jit(sm, donate_argnums=(0,) if donate else ())
