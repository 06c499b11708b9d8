"""Pixel MSE count loss.

Parity with the reference: nn.MSELoss on pred vs gt_dmap * log_para
(/root/reference/trainers/dgtrainer.py:50-57). The x1000 log_para scale
keeps density values in a numerically comfortable range (important in
bf16: raw densities ~1e-4 underflow the bf16 mantissa near zero).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from dgvcc_tpu.core.registry import LOSSES


def mse_count_loss(pred, gt_dmap, log_para: float = 1000.0, weights=None):
    pred = pred.astype(jnp.float32)
    gt = gt_dmap.astype(jnp.float32) * log_para
    if weights is not None:
        pred = pred * weights
        gt = gt * weights
    return jnp.mean((pred - gt) ** 2)


@dataclasses.dataclass
class MSECountLoss:
    """Callable matching the reference 'mse' loss entry (main.py:54-55)."""

    reduction: str = "mean"  # accepted for YAML compat; only 'mean' is used

    kind = "mse"

    def __call__(self, pred, gt_dmap, log_para: float = 1000.0, weights=None):
        return mse_count_loss(pred, gt_dmap, log_para, weights)


LOSSES.register("mse", lambda **kw: MSECountLoss(**kw))
