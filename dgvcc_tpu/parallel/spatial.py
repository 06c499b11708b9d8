"""Spatial training parallelism: shard the CROP HEIGHT over the mesh.

The reference trains on 320² crops because a full frame's activations
don't fit one GPU (datasets crop, configs `crop_size: 320`); there is
no multi-device code for this anywhere in it. On TPU the idiomatic
answer is GSPMD spatial partitioning: jit the UNCHANGED fused train
step (train/steps.py — written as single-device, global-view math)
with the image batch sharded on its height dimension. XLA then
partitions every conv (halo rows travel as ICI collective-permutes)
and inserts the cross-shard reduces that the global-view semantics
demand:

  * BN / whitening train-mode statistics → all-reduce over the sharded
    rows — EXACT single-device statistics, not the DP approximation of
    per-shard stats + pmean;
  * loss sums, gradient accumulation over space → all-reduce in the
    transpose;
  * dropout stays bit-identical to single-device because jax's
    partitionable threefry generates counter-based bits per position.

Net effect: per-chip activation memory drops ~N× (halo overhead is
~2 rows per conv per shard), so crops that OOM a single chip — or full
uncropped frames — train with single-device semantics. Numerics: the
per-step loss matches the unsharded step to float reduction order
(measured 4e-7 rel on the DG-final two-view step, incl. bit-identical
dropout thanks to partitionable threefry); over many steps
trajectories separate at the usual reduction-order-chaos rate, the
same class of divergence as changing XLA versions
(tests/test_spatial.py).

Config: ``mesh: {spatial: N}``. Composition with the data axis is
deliberately not offered yet — batch DP at crop sizes that fit a chip
is strictly faster (no halo traffic); spatial is for when one sample
doesn't fit or host cropping must go.

Beyond-reference component (SURVEY §2.9 lists TP/PP/SP as absent in
the reference); the serving twin is serve.py's ``shard="spatial"``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgvcc_tpu.train.steps import build_train_step, jit_train_step

SPATIAL_AXIS = "spatial"

# batch arrays carrying the image height on dim 1 — these shard;
# everything else (padded point lists, Bayesian targets, ISW masks,
# scalars) replicates
_SPATIAL_KEYS = frozenset({"img1", "img2", "dmap", "bmap",
                           "frames_u8", "dmaps"})
# the full-resolution subset whose replication would defeat the mode
_IMAGE_KEYS = frozenset({"img1", "img2", "frames_u8"})


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    from dgvcc_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices, devices, axis=SPATIAL_AXIS)


def shard_batch_spatial(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch with image heights sharded over the mesh.

    A non-image spatial key only shards when its height divides the
    axis size — low-res auxiliary targets (the stride-16 bmap at small
    geometries, downsampled dmaps) replicate instead. That costs
    nothing that matters: the memory pressure spatial mode exists for
    is the full-res image ACTIVATIONS, and GSPMD consumes a replicated
    operand against sharded ones without any resharding. The image
    keys themselves must divide, though — silently replicating them
    would run every chip at full activation memory while the log
    claims spatial sharding, so that raises with the fix (pick a crop
    height divisible by the axis size)."""
    n = mesh.devices.size
    sp = NamedSharding(mesh, P(None, SPATIAL_AXIS))
    rep = NamedSharding(mesh, P())

    def place(k, v):
        arr = np.asarray(v) if not hasattr(v, "shape") else v
        divisible = arr.ndim >= 2 and arr.shape[1] % n == 0
        if k in _IMAGE_KEYS and not divisible:
            raise ValueError(
                f"mesh: {{spatial: {n}}} needs the crop height divisible "
                f"by {n}, but batch['{k}'] has height {arr.shape[1]} — "
                "adjust crop_size (replicating the image would defeat "
                "the sharding)")
        spatial = k in _SPATIAL_KEYS and divisible
        return jax.device_put(v, sp if spatial else rep)

    return {k: place(k, v) for k, v in batch.items()}


def build_spatial_train_step(
    model, loss, mode: str, log_para: float, mesh: Mesh, donate: bool = True,
    loss_fn: Optional[Callable] = None, con_weight: float = 10.0,
) -> Callable:
    """The plain fused step, jitted; sharding comes from the committed
    inputs (state replicated by the caller via ``replicate(mesh, state)``,
    batch through :func:`shard_batch_spatial`). No axis_name, no
    explicit collectives — GSPMD owns the partitioning, which is what
    keeps the numerics exactly single-device."""
    step = build_train_step(model, loss, mode, log_para,
                            loss_fn=loss_fn, con_weight=con_weight)
    jitted = jit_train_step(step, donate=donate)

    def run(state, batch: Dict[str, Any], rng, epoch):
        return jitted(state, shard_batch_spatial(mesh, batch), rng, epoch)

    return run
