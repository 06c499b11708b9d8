"""VGG encoders (NHWC, flax).

Recreates torchvision VGG feature extractors used by the reference:
  * VGG16-BN split at features[:23], [23:33], [33:43] for the DG family
    (/root/reference/models/models.py:35-38) — three stages at strides
    4 / 8 / 16 with 256 / 512 / 512 channels;
  * VGG19 (plain and BN) stage splits for the generators / BL-VGG / SW.

Parameter modules are named ``conv{i}`` / ``bn{i}`` after the
torchvision ``features`` index so a state-dict converter is a pure key
rename (see nn/torch_io.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.nn.layers import TorchBatchNorm

# torchvision cfgs: 'M' = 2x2/2 max pool
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def feature_layout(cfg: Sequence, batch_norm: bool) -> List[Tuple[str, int, Any]]:
    """Expand a cfg into (kind, torchvision_feature_index, arg) tuples.

    kind in {'conv', 'bn', 'relu', 'pool'}; index matches the position in
    torchvision's nn.Sequential so splits like [:23] carry over verbatim.
    """
    layout = []
    idx = 0
    for v in cfg:
        if v == "M":
            layout.append(("pool", idx, None))
            idx += 1
        else:
            layout.append(("conv", idx, v))
            idx += 1
            if batch_norm:
                layout.append(("bn", idx, v))
                idx += 1
            layout.append(("relu", idx, None))
            idx += 1
    return layout


class VGGFeatures(nn.Module):
    """A contiguous slice [start:stop) of a torchvision VGG features stack."""

    cfg: Tuple = tuple(VGG16_CFG)
    batch_norm: bool = True
    start: int = 0
    stop: int = 10_000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for kind, idx, arg in feature_layout(self.cfg, self.batch_norm):
            if not (self.start <= idx < self.stop):
                continue
            if kind == "conv":
                x = nn.Conv(
                    arg,
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=True,  # torchvision VGG convs keep bias even with BN
                    dtype=self.dtype,
                    name=f"conv{idx}",
                )(x)
            elif kind == "bn":
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{idx}",
                )(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def vgg16bn_stage(start: int, stop: int, dtype=jnp.float32, name=None,
                  cfg=None) -> VGGFeatures:
    """``cfg``: override the conv plan (tiny test geometries — the
    multi-chip dryrun and fast tests shrink the encoder this way;
    start/stop then index the OVERRIDE's layout, not torchvision's)."""
    return VGGFeatures(cfg=tuple(VGG16_CFG if cfg is None else cfg),
                       batch_norm=True, start=start, stop=stop, dtype=dtype, name=name)


def vgg19_stage(start: int, stop: int, batch_norm: bool = False, dtype=jnp.float32,
                name=None, cfg=None) -> VGGFeatures:
    return VGGFeatures(cfg=tuple(VGG19_CFG if cfg is None else cfg),
                       batch_norm=batch_norm, start=start, stop=stop, dtype=dtype, name=name)
