"""SASNet — scale-adaptive selection network (reference
models/baselines/SASNet.py:47-256).

VGG16-BN 5-stage U-Net decoder; per-scale density heads
(inception-style MultiBranch + 1x1) and per-block confidence heads
(adaptive-avg-pool to (H/block, W/block)); sigmoid+softmax confidence
soft-selects among the 5 scale densities. Full-resolution output
(stride 2 of the stem... stage1 has no pool, so output = input res / 1
at x1 resolution — identical to the reference's x1 feature grid).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.vgg import vgg16bn_stage
from dgvcc_tpu.nn.layers import TorchBatchNorm


def _resize_bilinear(x, hw):
    # F.upsample_bilinear = align_corners=True (SASNet.py:141-150)
    from dgvcc_tpu.nn.layers import resize_bilinear_ac

    return resize_bilinear_ac(x, hw)


def _resize_nearest(x, hw):
    n, h, w, c = x.shape
    fh, fw = hw[0] // h, hw[1] // w
    if fh * h == hw[0] and fw * w == hw[1] and fh >= 1:
        return jnp.repeat(jnp.repeat(x, fh, axis=1), fw, axis=2)
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="nearest")


def _adaptive_avg_pool(x, out_hw):
    """F.adaptive_avg_pool2d: torch cell i averages rows
    [floor(i*h/oh), ceil((i+1)*h/oh)). Shapes are static, so the cell
    boundaries unroll to static slices (fast path: exact reshape-mean
    when divisible)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return x.reshape(n, oh, kh, ow, kw, c).mean(axis=(2, 4))

    import math as _math

    def pool_axis(arr, size, out, axis):
        slices = []
        for i in range(out):
            lo = (i * size) // out
            hi = _math.ceil((i + 1) * size / out)
            sl = jax.lax.slice_in_dim(arr, lo, hi, axis=axis)
            slices.append(sl.mean(axis=axis, keepdims=True))
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, h, oh, 1)
    return pool_axis(x, w, ow, 2)


class BasicConv(nn.Module):
    features: int
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p)] * 2, use_bias=False, dtype=self.dtype)(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class MultiBranch(nn.Module):
    """Inception-ish block (SASNet.py:216-240): concat of 1x1->1x1,
    1x1->3x3, 1x1->5x5 branches and the input → 4x channels."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        b1 = BasicConv(c // 2, 1, dtype=self.dtype)(x, train)
        b1 = BasicConv(c, 1, dtype=self.dtype)(b1, train)
        b3 = BasicConv(c // 2, 1, dtype=self.dtype)(x, train)
        b3 = BasicConv(c, 3, dtype=self.dtype)(b3, train)
        b5 = BasicConv(c // 2, 1, dtype=self.dtype)(x, train)
        b5 = BasicConv(c, 5, dtype=self.dtype)(b5, train)
        return jnp.concatenate([b1, b3, b5, x], axis=-1)


class ConvRelu(nn.Module):
    features: int
    kernel: int = 3
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p)] * 2, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


@MODELS.register("sasnet")
class SASNet(nn.Module):
    pretrained: bool = False
    block_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size_hw = x.shape[1:3]
        # VGG16-BN stages split at features [0:6],[6:13],[13:23],[23:33],[33:43]
        x1 = vgg16bn_stage(0, 6, dtype=self.dtype, name="features1")(x, train)
        x2 = vgg16bn_stage(6, 13, dtype=self.dtype, name="features2")(x1, train)
        x3 = vgg16bn_stage(13, 23, dtype=self.dtype, name="features3")(x2, train)
        x4 = vgg16bn_stage(23, 33, dtype=self.dtype, name="features4")(x3, train)
        x5 = vgg16bn_stage(33, 43, dtype=self.dtype, name="features5")(x4, train)

        y = ConvRelu(1024, dtype=self.dtype)(x5)
        y = ConvRelu(512, dtype=self.dtype)(y)
        x5_out = y
        y = _resize_bilinear(y, x4.shape[1:3])
        y = jnp.concatenate([x4, y], axis=-1)
        y = ConvRelu(512, dtype=self.dtype)(y)
        y = ConvRelu(256, dtype=self.dtype)(y)
        x4_out = y
        y = _resize_bilinear(y, x3.shape[1:3])
        y = jnp.concatenate([x3, y], axis=-1)
        y = ConvRelu(256, dtype=self.dtype)(y)
        y = ConvRelu(128, dtype=self.dtype)(y)
        x3_out = y
        y = _resize_bilinear(y, x2.shape[1:3])
        y = jnp.concatenate([x2, y], axis=-1)
        y = ConvRelu(128, dtype=self.dtype)(y)
        y = ConvRelu(64, dtype=self.dtype)(y)
        x2_out = y
        y = _resize_bilinear(y, x1.shape[1:3])
        y = jnp.concatenate([x1, y], axis=-1)
        y = ConvRelu(64, dtype=self.dtype)(y)
        y = ConvRelu(64, dtype=self.dtype)(y)
        x1_out = y

        outs = [x5_out, x4_out, x3_out, x2_out, x1_out]
        densities, confis = [], []
        conf_hw = (size_hw[0] // self.block_size, size_hw[1] // self.block_size)
        conf_mid = (256, 128, 64, 32, 32)
        for i, o in enumerate(outs):
            d = MultiBranch(dtype=self.dtype)(o, train)
            # density_head{n}.1 = Conv2d(..., NL default 'relu')
            # (SASNet.py:20-44,75-108) — the 1x1 head IS relu'd
            d = nn.relu(nn.Conv(1, (1, 1), dtype=self.dtype)(d))
            densities.append(_resize_nearest(d, x1.shape[1:3]))
            cf = _adaptive_avg_pool(o, conf_hw)
            cf = ConvRelu(conf_mid[i], kernel=1, dtype=self.dtype)(cf)
            cf = ConvRelu(1, kernel=1, relu=False, dtype=self.dtype)(cf)
            confis.append(_resize_nearest(cf, x1.shape[1:3]))

        conf = jnp.concatenate(confis, axis=-1)
        conf = nn.sigmoid(conf)
        conf = jax.nn.softmax(conf, axis=-1)
        dens = jnp.concatenate(densities, axis=-1)
        return jnp.sum(dens * conf, axis=-1, keepdims=True)
