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


def make_mesh(n_devices: Optional[int] = None, devices=None,
              axis: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"mesh {axis}={n_devices} but only {len(devices)} devices "
                "visible — a silently smaller mesh would shard less than "
                "the config promises")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place host batch arrays sharded along the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


# batch keys that are per-step CONSTANTS, replicated on every shard
# rather than split along the batch axis (the ISW sensitive-covariance
# masks from IswCovTracker.mask_batch — the reference broadcasts them
# implicitly because its CovMatrix_ISW lives on every rank,
# models/ISW/cov_settings.py:16-89)
_REPLICATED_PREFIX = "isw_"


def build_parallel_train_step(
    model, loss, mode: str, log_para: float, mesh: Mesh, donate: bool = True,
    loss_fn: Optional[Callable] = None, con_weight: float = 10.0,
    model_axis: Optional[str] = None,
) -> Callable:
    """shard_map-wrapped train step: per-shard fwd/bwd + pmean sync.

    Input batch must be sharded on axis 0 over the data axis (use
    :func:`shard_batch`); state is replicated. Batch keys starting with
    ``isw_`` are treated as replicated constants (whitening masks).
    Returns a callable (state, batch, rng, epoch) → (state, metrics).

    Live cross-shard statistic sync (the SyncSwitchWhiten /
    SyncBatchNorm role, models/ISW/sync_switchwhiten.py:12-56) happens
    INSIDE the model forward: build the model with
    ``axis_name=DATA_AXIS`` so SwitchWhiten/BatchNorm pmean their batch
    mean/cov over the mesh axis during training.

    ``model_axis``: composed 2-D tensor parallelism over a ('data',
    model_axis) mesh — the DG memory bank (and its optimizer moments,
    matched by tree path) shard over the model axis; everything else
    stays replicated. The model must be built with
    ``tp_axis=model_axis`` (but INIT with a tp-free twin — collectives
    are unbound outside shard_map; param structure is identical). The
    dropout rng folds the DATA index only: model shards must draw the
    same masks around their sharded bank. Gradients of replicated
    params fall out of the shard_map transpose over BOTH axes (the
    per-shard bank contributions genuinely sum); the bank's own
    gradient stays per-shard. Numerical equality with the 1-D step is
    tested in tests/test_tp2d.py.
    """
    per_shard = build_train_step(model, loss, mode, log_para,
                                 axis_name=DATA_AXIS, loss_fn=loss_fn,
                                 con_weight=con_weight)

    def wrapped(state, batch, consts, rng, epoch):
        # same dropout key on every shard would correlate noise; fold in
        # the shard index (data axis only — see docstring)
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, idx)
        return per_shard(state, dict(batch, **consts), rng, epoch)

    batch_spec = P(DATA_AXIS)
    cache = {}

    def call(state, batch, rng, epoch):
        consts = {k: batch.pop(k) for k in list(batch)
                  if k.startswith(_REPLICATED_PREFIX)}
        if "jitted" not in cache:
            # the spec tree depends on the state STRUCTURE only — build
            # the shard_map + jit once (jit handles shape changes)
            state_spec = (P() if model_axis is None
                          else _state_specs(state, model_axis))
            sm = shard_map(
                wrapped, mesh=mesh,
                in_specs=(state_spec, batch_spec, P(), P(), P()),
                out_specs=(state_spec, P()),
            )
            cache["jitted"] = jax.jit(sm, donate_argnums=(0,) if donate
                                      else ())
        return cache["jitted"](state, batch, consts, rng, epoch)

    return call


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data × model) mesh: batches shard over 'data', the memory
    bank's prototype axis shards over 'model'."""
    from dgvcc_tpu.parallel.tp import MODEL_AXIS

    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {{data: {n_data}, model: {n_model}}} needs {n} devices "
            f"but only {len(devices)} are available")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


def _state_specs(state, model_axis: str):
    """PartitionSpec tree for a TrainState: everything replicated except
    the memory bank (params['memory']['mem'] and its optimizer moments,
    matched by path) — those shard over ``model_axis`` on the prototype
    axis. Covers adam mu/nu and MultiSteps acc_grads automatically
    because their trees mirror the param structure."""

    def spec(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "memory" in names and "mem" in names and np.ndim(leaf) == 2:
            return P(None, model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_2d(mesh: Mesh, state):
    """Place a TrainState for the 2-D step: bank sharded, rest replicated."""
    from dgvcc_tpu.parallel.tp import MODEL_AXIS

    specs = _state_specs(state, MODEL_AXIS)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        state, specs)


def build_parallel_train_step_2d(
    model, loss, mode: str, log_para: float, mesh: Mesh, donate: bool = True,
    loss_fn: Optional[Callable] = None, con_weight: float = 10.0,
) -> Callable:
    """:func:`build_parallel_train_step` over a 2-D ('data', 'model')
    mesh with the memory bank sharded over 'model' — see the
    ``model_axis`` paragraph there."""
    from dgvcc_tpu.parallel.tp import MODEL_AXIS

    return build_parallel_train_step(model, loss, mode, log_para, mesh,
                                     donate=donate, loss_fn=loss_fn,
                                     con_weight=con_weight,
                                     model_axis=MODEL_AXIS)


def build_parallel_joint_step(gen_model, reg_model, loss, log_para,
                              mesh: Mesh, donate: bool = True) -> Callable:
    """shard_map wrapper for the two-optimizer joint mode: generator and
    regressor each get DDP-mean gradients and pmean'd batch stats
    (train/genjoint.py::build_joint_step with axis_name). Signature
    (gen_state, reg_state, batch, rng, epoch) → (gen_state, reg_state,
    metrics)."""
    from dgvcc_tpu.train.genjoint import build_joint_step

    per_shard = build_joint_step(gen_model, reg_model, loss, log_para,
                                 axis_name=DATA_AXIS)

    def wrapped(gen_state, reg_state, batch, rng, epoch):
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, idx)
        return per_shard(gen_state, reg_state, batch, rng, epoch)

    sm = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sm, donate_argnums=(0, 1) if donate else ())
