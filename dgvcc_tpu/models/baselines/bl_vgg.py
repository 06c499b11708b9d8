"""BL-VGG — VGG19 + reg head, |output| (reference models/baselines/BL.py:11-56).
Output: 1/8-resolution density (x2 bilinear from stride-16 features)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import upsample
from dgvcc_tpu.nn.vgg import VGGFeatures, VGG19_CFG


@MODELS.register("bl")
class BLVGG(nn.Module):
    pretrained: bool = False
    # vgg19_bn backbone variant (torchvision ships both; the reference's
    # SW vgg file lists the vgg19_bn URL, SW/backbones/vgg.py:12-14).
    # Plain vgg19 (reference default) only trains from ImageNet init —
    # from scratch its unnormalized 16-conv stack collapses under the
    # Bayesian loss's L1 pressure; the BN variant trains from scratch.
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # VGG19 features WITHOUT the last pool: cfg 'E' truncated
        # (BL.py:46: [64..512x4] — no trailing 'M')
        feats = VGGFeatures(cfg=tuple(VGG19_CFG[:-1]), batch_norm=self.batch_norm,
                            dtype=self.dtype, name="features")(x, train=train)
        y = upsample(feats, 2, align_corners=True)  # F.upsample_bilinear, BL.py:25
        y = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="reg1")(y)
        y = nn.relu(y)
        y = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="reg2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="reg3")(y)
        return jnp.abs(y)
