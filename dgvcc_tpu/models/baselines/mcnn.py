"""MCNN — 3-column multi-kernel CNN (reference models/baselines/MCNN.py:7-75).
Output: 1/4-resolution density."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS


class _Branch(nn.Module):
    chans: Tuple[int, ...]
    ksizes: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (c, k) in enumerate(zip(self.chans, self.ksizes)):
            p = k // 2
            x = nn.Conv(c, (k, k), padding=[(p, p)] * 2, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            if i < 2:  # pools after the first two convs
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


@MODELS.register("mcnn")
class MCNN(nn.Module):
    pretrained: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = _Branch((16, 32, 16, 8), (9, 7, 7, 7), dtype=self.dtype, name="branch1")(x)
        b2 = _Branch((20, 40, 20, 10), (7, 5, 5, 5), dtype=self.dtype, name="branch2")(x)
        b3 = _Branch((24, 48, 24, 12), (5, 3, 3, 3), dtype=self.dtype, name="branch3")(x)
        y = jnp.concatenate([b1, b2, b3], axis=-1)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="fuse")(y)
