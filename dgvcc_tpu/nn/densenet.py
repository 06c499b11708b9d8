"""DenseNet-BC trunk with pluggable norm1 sites (SW / IBN variants).

One flax implementation covers the reference's two DenseNet backbone
families, which it ships but never wires into a counter:

  * SW DenseNet (models/SW/backbones/densenet.py:78-201): norm1 of
    every 3rd dense layer (i % 3 == 0) in stages with
    stage_with_sw=(T,T,T,F) — and the stem norm0 — become
    SwitchWhiten2d; all other norms stay BN.
  * DenseNet-IBN-a (models/ibnnet/densenet_ibn.py:96-186): norm1 of
    every 3rd dense layer in the first three stages becomes the local
    BN-first IBN(ratio=0.4) variant (densenet_ibn.py:28-40).

Geometry is torchvision DenseNet-BC (densenet.py:147-199): 7x7/2 stem,
3x3/2 maxpool, dense blocks of (norm1-relu-conv1x1[bn_size*k] -
norm2-relu-conv3x3[k] - concat) layers, BN-relu-conv1x1(half)-avgpool
transitions, final norm5.

Module names mirror torch (features.denseblock{b}.denselayer{l}.norm1 →
denseblock{b}_denselayer{l}_norm1) so a torchvision state dict converts
by rename (nn/torch_io.py::densenet_to_flax).

``num_stages=3`` truncates after denseblock3 at stride 16 / 1024 ch for
densenet121 — the same contract as the ResNet counters' layer3 cut —
and uses transition3's BN as the final norm so pretrained weights still
cover every site.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.nn.layers import TorchBatchNorm

from dgvcc_tpu.nn.whitening import IBN, SwitchWhiten

# torchvision block configs (SW/backbones/densenet.py:21-75)
DENSENET_CONFIGS = {
    121: dict(num_init_features=64, growth_rate=32, block_config=(6, 12, 24, 16)),
    169: dict(num_init_features=64, growth_rate=32, block_config=(6, 12, 32, 32)),
    201: dict(num_init_features=64, growth_rate=32, block_config=(6, 12, 48, 32)),
    161: dict(num_init_features=96, growth_rate=48, block_config=(6, 12, 36, 24)),
}


class DenseNetTrunk(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    num_stages: int = 4
    # norm1-site override: None | 'sw' | 'ibn'; applied at layer i%3==0
    # of stages where stage_with[k] (SW densenet.py:122, ibn densenet_ibn.py:126)
    norm1_mode: Optional[str] = None
    stage_with: Sequence[bool] = (True, True, True, False)
    sw_kwargs: dict = None
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                axis_name=self.axis_name)

        def norm1(name, ch, special: bool):
            """norm1 site: SW/IBN when this layer is selected, BN else."""
            if special and self.norm1_mode == "sw":
                sw = SwitchWhiten(ch, dtype=self.dtype, name=name,
                                  **(self.sw_kwargs or {}))
                return lambda z: sw(z, train=train)
            if special and self.norm1_mode == "ibn":
                # DenseNet-IBN uses the BN-first split at ratio 0.4
                # (densenet_ibn.py:102, :28-40)
                ibn = IBN(ch, ratio=0.4, bn_first=True,
                          axis_name=self.axis_name, dtype=self.dtype, name=name)
                return lambda z: ibn(z, train=train)
            b = bn(name)
            return lambda z: b(z)

        # stem (densenet.py:165-170); norm0 is SW in the SW variant
        out = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                      padding=[(3, 3), (3, 3)], use_bias=False,
                      dtype=self.dtype, name="conv0")(x)
        out = norm1("norm0", self.num_init_features,
                    self.norm1_mode == "sw")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        num_features = self.num_init_features
        for b, num_layers in enumerate(self.block_config[: self.num_stages]):
            # dense block (densenet.py:106-123)
            for i in range(num_layers):
                prefix = f"denseblock{b + 1}_denselayer{i + 1}"
                special = self.stage_with[b] and i % 3 == 0
                y = norm1(f"{prefix}_norm1", num_features, special)(out)
                y = nn.relu(y)
                y = nn.Conv(self.bn_size * self.growth_rate, (1, 1),
                            use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_conv1")(y)
                y = bn(f"{prefix}_norm2")(y)
                y = nn.relu(y)
                y = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1)] * 2,
                            use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_conv2")(y)
                if self.drop_rate > 0 and train:
                    y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
                out = jnp.concatenate([out, y], axis=-1)
                num_features += self.growth_rate
            last_stage = b == len(self.block_config) - 1
            if b == self.num_stages - 1:
                if last_stage:
                    out = bn("norm5")(out)  # final norm (densenet.py:192)
                else:
                    # truncated trunk: reuse this transition's BN as the
                    # final norm so pretrained weights cover it
                    out = bn(f"transition{b + 1}_norm")(out)
                out = nn.relu(out)
                return out
            # transition (densenet.py:136-147)
            out = bn(f"transition{b + 1}_norm")(out)
            out = nn.relu(out)
            num_features //= 2
            out = nn.Conv(num_features, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"transition{b + 1}_conv")(out)
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        return out
