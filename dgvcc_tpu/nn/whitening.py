"""Whitening layers: Switchable Whitening, Instance Whitening, IBN.

Re-designs of the reference's whitening zoo for TPU:

  * SwitchWhiten (reference models/SW/ops/switchwhiten.py:7-183): per-
    group softmax mix of batch/instance (+LN/BN/IN) means & covariances,
    whitening matrix Sigma^(-1/2) via Newton-Schulz iteration. The whole
    layer is batched (g- or Ng-sized) c x c matmuls — pure MXU work, no
    eigendecompositions.
  * Sync variant (models/ISW/sync_switchwhiten.py): instead of torch
    autograd.Function all_reduce hooks, pass ``axis_name`` — batch
    mean/cov are lax.pmean'd across the data mesh axis in the forward,
    and gradient synchronization falls out of shard_map's transpose rule
    automatically.
  * InstanceWhitening (models/ISW/instance_whitening.py:5-16): IN
    without affine, returning the standardized features for the
    whitening loss.
  * IBN (models/ibnnet/modules.py:5-25): channel-split IN(affine) + BN.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.nn.layers import TorchBatchNorm


def newton_schulz_inv_sqrt(cov: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Sigma^(-1/2) by coupled Newton-Schulz (switchwhiten.py:166-175).

    cov: (..., c, c) SPD. Trace-normalized iteration:
        P_0 = I;  P_{k+1} = 1.5 P_k - 0.5 P_k^3 (cov/tr)
        Sigma^(-1/2) ≈ P_T / sqrt(tr)
    All matmuls, f32 accumulation.
    """
    c = cov.shape[-1]
    eye = jnp.eye(c, dtype=cov.dtype)
    tr = jnp.trace(cov, axis1=-2, axis2=-1)[..., None, None]
    r_tr = 1.0 / tr
    cov_n = cov * r_tr
    # derive p from cov (not a fresh broadcast) so it inherits cov's
    # varying-manual-axes under shard_map — the scan carry type must be
    # stable across iterations
    p = jnp.zeros_like(cov_n) + eye

    def body(p, _):
        p3 = p @ p @ p
        p = 1.5 * p - 0.5 * (p3 @ cov_n)
        return p, None

    p, _ = jax.lax.scan(body, p, None, length=iters)
    return p * jnp.sqrt(r_tr)


class SwitchWhiten(nn.Module):
    """Switchable Whitening over NHWC inputs.

    Channels are split into groups of ``num_pergroup``; per group a
    learned softmax mixes batch-whitening (BW) and instance-whitening
    (IW) statistics (+ LN/BN/IN for sw_type 3/5). Running mean/cov live
    in batch_stats (initialized to zero like the reference's
    reset_parameters, switchwhiten.py:68-70). ``axis_name`` pmean's the
    batch statistics across a data mesh axis (SyncSwitchWhiten role).
    """

    num_features: int
    num_pergroup: int = 16
    sw_type: int = 2
    T: int = 5
    tie_weight: bool = False
    eps: float = 1e-5
    momentum: float = 0.99
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sw_type not in (2, 3, 5):
            raise ValueError(f"sw_type must be 2, 3 or 5, got {self.sw_type}")
        n, h, w, ch = x.shape
        assert ch == self.num_features and ch % self.num_pergroup == 0
        c = self.num_pergroup
        g = ch // c
        hw = h * w
        xf = x.astype(jnp.float32)

        n_comp = self.sw_type
        mean_weight = self.param("sw_mean_weight", nn.initializers.ones, (n_comp,))
        var_weight = (
            mean_weight if self.tie_weight
            else self.param("sw_var_weight", nn.initializers.ones, (n_comp,))
        )

        running_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((g, c, 1), jnp.float32)
        )
        running_cov = self.variable(
            "batch_stats", "running_cov", lambda: jnp.zeros((g, c, c), jnp.float32)
        )

        # data as (N, g, c, HW)
        data = xf.reshape(n, hw, g, c).transpose(0, 2, 3, 1)

        if train:
            # batch stats over (N, HW) per group
            mean_bn = data.mean(axis=(0, 3))[..., None]  # (g, c, 1)
            if self.axis_name:
                mean_bn = jax.lax.pmean(mean_bn, self.axis_name)
            centered = data - mean_bn[None]
            cov_bn = jnp.einsum("ngcp,ngdp->gcd", centered, centered) / (n * hw)
            if self.axis_name:
                cov_bn = jax.lax.pmean(cov_bn, self.axis_name)
            if not self.is_initializing():
                running_mean.value = (
                    self.momentum * running_mean.value + (1 - self.momentum) * mean_bn
                )
                running_cov.value = (
                    self.momentum * running_cov.value + (1 - self.momentum) * cov_bn
                )
        else:
            mean_bn = running_mean.value
            cov_bn = running_cov.value

        # instance stats per (N, g)
        mean_in = data.mean(axis=3, keepdims=True)  # (N, g, c, 1)
        x_in = data - mean_in
        cov_in = jnp.einsum("ngcp,ngdp->ngcd", x_in, x_in) / hw

        eye = jnp.eye(c, dtype=jnp.float32)
        mw = jax.nn.softmax(mean_weight.astype(jnp.float32))
        vw = jax.nn.softmax(var_weight.astype(jnp.float32))

        mean_bn_b = jnp.broadcast_to(mean_bn[None], (n, g, c, 1))
        cov_bn_b = jnp.broadcast_to(cov_bn[None], (n, g, c, c))

        if self.sw_type == 2:
            mean = mw[0] * mean_bn_b + mw[1] * mean_in
            cov = vw[0] * cov_bn_b + vw[1] * cov_in + self.eps * eye
        elif self.sw_type == 3:
            mean_ln = xf.reshape(n, -1).mean(axis=1).reshape(n, 1, 1, 1)
            var_ln = xf.reshape(n, -1).var(axis=1, ddof=1).reshape(n, 1, 1, 1)
            mean = mw[0] * mean_bn_b + mw[1] * mean_in + mw[2] * mean_ln
            cov = (vw[0] * cov_bn_b + vw[1] * cov_in
                   + vw[2] * var_ln * eye + self.eps * eye)
        else:  # sw_type == 5 (switchwhiten.py:158-164)
            mean_ln = xf.reshape(n, -1).mean(axis=1).reshape(n, 1, 1, 1)
            var_ln = xf.reshape(n, -1).var(axis=1, ddof=1).reshape(n, 1, 1, 1)
            diag = lambda m: jnp.eye(c) * jnp.diagonal(m, axis1=-2, axis2=-1)[..., None, :]
            var_bn = diag(cov_bn_b)
            var_in = diag(cov_in)
            mean = ((mw[0] + mw[2]) * mean_bn_b + (mw[1] + mw[3]) * mean_in
                    + mw[4] * mean_ln)
            cov = (vw[0] * cov_bn_b + vw[1] * cov_in + vw[0] * var_bn
                   + vw[1] * var_in + vw[4] * var_ln * eye + self.eps * eye)

        wm = newton_schulz_inv_sqrt(cov, self.T)  # (N, g, c, c)
        x_hat = jnp.einsum("ngcd,ngdp->ngcp", wm, data - mean)
        # back to NHWC
        x_hat = x_hat.transpose(0, 3, 1, 2).reshape(n, h, w, ch)

        if self.affine:
            scale = self.param("weight", nn.initializers.ones, (ch,))
            bias = self.param("bias", nn.initializers.zeros, (ch,))
            x_hat = x_hat * scale + bias
        return x_hat.astype(x.dtype)


class InstanceNorm(nn.Module):
    """nn.InstanceNorm2d over NHWC (eps 1e-5, no running stats)."""

    affine: bool = False

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class InstanceWhitening(nn.Module):
    """IN without affine; returns (x, w) with w = x
    (models/ISW/instance_whitening.py:5-16)."""

    @nn.compact
    def __call__(self, x):
        y = InstanceNorm(affine=False)(x)
        return y, y


def get_covariance_matrix(f_map: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, C, C) covariance /(HW-1) + eps*I
    (instance_whitening.py:30-39)."""
    b, h, w, c = f_map.shape
    f = f_map.astype(jnp.float32).reshape(b, h * w, c)
    cov = jnp.einsum("bpc,bpd->bcd", f, f) / (h * w - 1)
    return cov + 1e-5 * jnp.eye(c, dtype=jnp.float32)


def instance_whitening_loss(f_map, mask_matrix, margin, num_remove_cov):
    """Masked mean |off-diagonal covariance| (instance_whitening.py:19-27)."""
    f_cor = get_covariance_matrix(f_map)
    masked = f_cor * mask_matrix
    off_diag_sum = jnp.sum(jnp.abs(masked), axis=(1, 2)) - margin
    loss = jnp.clip(off_diag_sum / jnp.maximum(num_remove_cov, 1.0), 0.0)
    return jnp.mean(loss)


class IBN(nn.Module):
    """Instance-Batch Norm: IN(affine) on the first half of channels,
    BN on the rest (models/ibnnet/modules.py:5-25).

    ``bn_first`` flips the split to the DenseNet-IBN local variant
    (models/ibnnet/densenet_ibn.py:28-40): BN on the first
    ``int(planes*(1-ratio))`` channels, IN on the remainder."""

    planes: int
    ratio: float = 0.5
    bn_first: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(z):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name="BN",
                                axis_name=self.axis_name)(z)

        if self.bn_first:
            half = int(self.planes * (1 - self.ratio))
            x1, x2 = x[..., :half], x[..., half:]
            return jnp.concatenate(
                [bn(x1), InstanceNorm(affine=True, name="IN")(x2)], axis=-1)
        half = int(self.planes * self.ratio)
        x1, x2 = x[..., :half], x[..., half:]
        y1 = InstanceNorm(affine=True, name="IN")(x1)
        return jnp.concatenate([y1, bn(x2)], axis=-1)


class SELayer(nn.Module):
    """Squeeze-excitation (models/ibnnet/modules.py:28-43)."""

    channel: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, _, _, c = x.shape
        y = x.mean(axis=(1, 2))
        y = nn.Dense(int(c / self.reduction), use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]
