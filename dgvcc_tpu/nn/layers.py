"""Flax building blocks shared by every model.

NHWC everywhere (TPU-native layout). Parity notes reference the
DGVCC sources they re-create, e.g. ConvBlock mirrors
/root/reference/models/models.py:8-21 (conv → optional BN → optional
ReLU, conv bias off by default).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BatchNorm(nn.Module):
    """Drop-in for ``flax.linen.BatchNorm`` with torch's running-stat
    semantics.

    flax updates the running variance with the BIASED batch variance;
    ``torch.nn.BatchNorm2d`` normalizes with the biased variance but
    stores the UNBIASED one (``var * n/(n-1)``) in ``running_var``
    (ATen batch-norm update). The difference is O(1/n) per step, which
    is invisible at production feature-map sizes but measurably shifts
    eval-mode outputs after training when n = B*H*W is small (caught by
    the CCTrans cross-framework A/B, whose Regression-head BNs see tiny
    grids at toy geometry). Variable names match flax's exactly
    (params: scale/bias, batch_stats: mean/var) so checkpoints and the
    torch converters are unaffected.

    ``axis_name`` syncs batch stats across a mesh axis (SyncBN role);
    the unbiased correction then uses the GLOBAL element count, like
    torch SyncBatchNorm.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, red)
            mean2 = jnp.mean(jnp.square(xf), red)
            if self.axis_name:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            n = 1
            for i in red:
                n *= x.shape[i]
            if self.axis_name:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1 - m) * var * (n / jnp.maximum(n - 1, 1)))
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * mul + bias
        return y.astype(self.dtype)


# flax auto-names submodules by class name; keeping the class named
# BatchNorm preserves 'BatchNorm_0' auto-paths in converted
# checkpoints. TorchBatchNorm is the descriptive alias.
TorchBatchNorm = BatchNorm


class ConvBlock(nn.Module):
    """conv(+BN)(+ReLU) — reference models.py:8-21.

    BatchNorm uses running averages at eval (``use_running_average=not
    train``) with torch's default momentum 0.1 (flax momentum = 0.9) and
    eps 1e-5 to match nn.BatchNorm2d.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    bn: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def _ac_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with torch
    align_corners=True endpoint mapping: pos_i = i * (n_in-1)/(n_out-1).

    Static-shape trace-time constant — the resize becomes two einsum
    contractions, which XLA tiles onto the MXU (vs. the gather-based
    jax.image.resize path)."""
    a = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        a[:, 0] = 1.0
        return a
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    np.add.at(a, (np.arange(n_out), lo), 1.0 - frac)
    np.add.at(a, (np.arange(n_out), hi), frac)
    return a


def resize_bilinear_ac(x: jnp.ndarray, hw) -> jnp.ndarray:
    """NHWC bilinear resize to (H, W) with align_corners=True — parity
    with torch F.upsample_bilinear / nn.UpsamplingBilinear2d (the
    deprecated aliases the reference uses in BL.py:25, SASNet.py:141-150,
    SW/__init__.py:17, ibnnet/__init__.py:23, ISW/__init__.py:44,
    CCTrans.py:24-34)."""
    n, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    ah = jnp.asarray(_ac_interp_matrix(h, hw[0]), x.dtype)
    aw = jnp.asarray(_ac_interp_matrix(w, hw[1]), x.dtype)
    y = jnp.einsum("Hh,nhwc->nHwc", ah, x)
    return jnp.einsum("Ww,nHwc->nHWc", aw, y)


def upsample(x: jnp.ndarray, scale_factor: int = 2, mode: str = "bilinear",
             align_corners: bool = False) -> jnp.ndarray:
    """NHWC spatial upsample; parity with F.interpolate (models.py:23-27).

    ``bilinear`` matches torch align_corners=False (half-pixel centers =
    jax.image 'linear') unless ``align_corners=True`` (endpoint mapping,
    the F.upsample_bilinear legacy alias); ``nearest`` matches torch's
    floor-index nearest.
    """
    n, h, w, c = x.shape
    new_shape = (n, h * scale_factor, w * scale_factor, c)
    if mode == "nearest":
        # torch nearest: out[i] = in[floor(i / scale)] — exact via repeat
        x = jnp.repeat(x, scale_factor, axis=1)
        x = jnp.repeat(x, scale_factor, axis=2)
        return x
    if align_corners:
        return resize_bilinear_ac(x, new_shape[1:3])
    return jax.image.resize(x, new_shape, method="linear")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) spatial standardization; F.instance_norm parity.

    No affine params (reference calls the functional form,
    models.py:303-304). NHWC: reduce over H, W.
    """
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def dropout2d(x: jnp.ndarray, rate: float, rng: jax.Array, deterministic: bool = False) -> jnp.ndarray:
    """Channel dropout (torch nn.Dropout2d): zero whole channels, scale by 1/(1-p).

    NHWC: mask shape (N, 1, 1, C).
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape=(x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, 0.0)


class Dropout2d(nn.Module):
    """Module wrapper over :func:`dropout2d` drawing from the 'dropout' rng."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        return dropout2d(x, self.rate, self.make_rng("dropout"), deterministic=False)


def concat_channels(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Channel concat (NHWC last axis) — torch cat(dim=1) analog."""
    return jnp.concatenate(xs, axis=-1)
