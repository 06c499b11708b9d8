"""CSRNet — VGG16 frontend + dilated backend (reference
models/baselines/CSRNet.py:10-44). Output: 1/8-resolution density."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS

FRONTEND = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
BACKEND = (512, 512, 512, 256, 128, 64)


class _ConvStack(nn.Module):
    cfg: Sequence
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(d, d)] * 2,
                            kernel_dilation=(d, d), dtype=self.dtype,
                            name=f"conv{i}")(x)
                x = nn.relu(x)
                i += 1
        return x


@MODELS.register("csrnet")
class CSRNet(nn.Module):
    pretrained: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvStack(FRONTEND, dtype=self.dtype, name="frontend")(x)
        x = _ConvStack(BACKEND, dilation=2, dtype=self.dtype, name="backend")(x)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="output_layer")(x)
