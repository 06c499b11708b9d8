"""ResNet trunk with pluggable normalization.

One flax implementation serves all three DG-baseline counters
(reference keeps three near-identical ResNets:
models/SW/backbones/resnet.py, models/ibnnet/resnet_ibn.py,
models/ISW/Resnet.py). Differences are expressed as per-stage norm
specs:

  * SW  — stem norm = SwitchWhiten; bottleneck norm2 = SwitchWhiten in
    odd-indexed non-first blocks of stages with SW
    (SW/backbones/resnet.py:203-214, stage_with_sw=(T,T,T,F));
  * IBN-b — stem norm = IN(affine); post-residual IN(affine) in the
    LAST block of stages 1-2 (resnet_ibn.py:152-159, cfg ('b','b',None,None));
  * IBN-a — bn1 of every block replaced by IBN (not consumed by the
    shipped counters but supported);
  * ISW — stem norm = InstanceWhitening; post-residual InstanceWhitening
    in the last block of stages with wt>0 (ISW/Resnet.py:446-451,
    wt_layer=[0,0,2,2,2,0,0]); whitened features are collected into
    w_arr for the whitening loss.

Module names mirror torch (conv1/bn1/layer{k}/{i}/conv{j}) so a
torchvision resnet50 state dict converts by rename.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.nn.layers import TorchBatchNorm

from dgvcc_tpu.nn.whitening import IBN, InstanceNorm, InstanceWhitening, SwitchWhiten

# per-stage norm spec fields:
#   sw:   apply SW as bottleneck norm2 in odd non-first blocks
#   ibn_a: IBN as bn1 in every block
#   post: None | 'in' | 'iw' — after the residual add of the LAST block
StageSpec = dict


class Bottleneck(nn.Module):
    """3-conv residual block. ``groups``/``base_width`` give the ResNeXt
    type-C geometry (D*C wide grouped 3x3, models/ibnnet/resnext_ibn.py:24-48);
    ``se`` appends squeeze-excitation after bn3
    (models/ibnnet/se_resnet_ibn.py:22-63)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    sw_norm2: bool = False
    ibn_a: bool = False
    post: Optional[str] = None  # None | 'in' | 'iw'
    sw_kwargs: dict = None
    groups: int = 1
    base_width: int = 64
    se: bool = False
    axis_name: Optional[str] = None  # sync BN/IBN stats over this mesh axis
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                axis_name=self.axis_name)

        # ResNeXt width: D = floor(planes * baseWidth/64), C = cardinality
        # (resnext_ibn.py:35-36); plain bottleneck when groups == 1.
        width = int(self.planes * (self.base_width / 64)) * self.groups

        residual = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        if self.ibn_a:
            out = IBN(width, axis_name=self.axis_name, dtype=self.dtype,
                      name="bn1")(out, train=train)
        else:
            out = bn("bn1")(out)
        out = nn.relu(out)

        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                      feature_group_count=self.groups, name="conv2")(out)
        if self.sw_norm2:
            out = SwitchWhiten(width, dtype=self.dtype, name="bn2",
                               **(self.sw_kwargs or {}))(out, train=train)
        else:
            out = bn("bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.se:
            from dgvcc_tpu.nn.whitening import SELayer

            out = SELayer(self.planes * self.expansion, dtype=self.dtype,
                          name="se")(out)

        if self.has_downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)

        out = out + residual

        w = None
        if self.post == "in":
            out = InstanceNorm(affine=True, name="post_in")(out)
        elif self.post == "iw":
            out, w = InstanceWhitening(name="post_iw")(out)
        out = nn.relu(out)
        return out, w


class BasicBlock(nn.Module):
    """2-conv residual block (resnet18/34). SW variant: norm1 replaced
    by SwitchWhiten (SW/backbones/resnet.py:27-74); IBN-a: bn1 → IBN;
    post-residual IN/IW like Bottleneck."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    sw_norm2: bool = False  # for BasicBlock the SW site is norm1
    ibn_a: bool = False
    post: Optional[str] = None
    sw_kwargs: dict = None
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                axis_name=self.axis_name)

        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        if self.sw_norm2:
            out = SwitchWhiten(self.planes, dtype=self.dtype, name="bn1",
                               **(self.sw_kwargs or {}))(out, train=train)
        elif self.ibn_a:
            out = IBN(self.planes, axis_name=self.axis_name, dtype=self.dtype,
                      name="bn1")(out, train=train)
        else:
            out = bn("bn1")(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)

        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)

        out = out + residual
        w = None
        if self.post == "in":
            out = InstanceNorm(affine=True, name="post_in")(out)
        elif self.post == "iw":
            out, w = InstanceWhitening(name="post_iw")(out)
        out = nn.relu(out)
        return out, w


# torchvision layer counts by depth
RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
RESNET_BLOCK = {18: "basic", 34: "basic", 50: "bottleneck",
                101: "bottleneck", 152: "bottleneck"}


class ResNetTrunk(nn.Module):
    """ResNet through ``num_stages`` stages (stride 4*2^k).

    Returns (features, w_arr) — w_arr holds whitened feature maps from
    'iw' sites (stem + post-residual), for the ISW whitening loss.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' for resnet18/34
    num_stages: int = 4
    stem_norm: str = "bn"  # 'bn' | 'in_affine' | 'iw' | 'sw'
    stage_sw: Sequence[bool] = (False, False, False, False)
    stage_ibn_a: Sequence[bool] = (False, False, False, False)
    stage_post: Sequence[Optional[str]] = (None, None, None, None)
    sw_kwargs: dict = None
    groups: int = 1       # ResNeXt cardinality (resnext_ibn.py:145-172)
    base_width: int = 64  # ResNeXt baseWidth (4 for resnext*_ibn_a)
    se: bool = False      # squeeze-excitation blocks (se_resnet_ibn.py)
    axis_name: Optional[str] = None  # SyncBN analog: pmean batch stats
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_arr = []
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        if self.stem_norm == "bn":
            out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype, name="bn1",
                               axis_name=self.axis_name)(out)
        elif self.stem_norm == "in_affine":
            out = InstanceNorm(affine=True, name="bn1")(out)
        elif self.stem_norm == "iw":
            out, w = InstanceWhitening(name="bn1")(out)
            w_arr.append(w)
        elif self.stem_norm == "sw":
            out = SwitchWhiten(64, dtype=self.dtype, name="bn1",
                               **(self.sw_kwargs or {}))(out, train=train)
        else:
            raise ValueError(self.stem_norm)
        out = nn.relu(out)
        # 3x3/2 max pool, padding 1 (torch MaxPool2d(3, 2, 1))
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        inplanes = 64
        for k in range(self.num_stages):
            planes = 64 * (2**k)
            stride = 1 if k == 0 else 2
            n_blocks = self.layers[k]
            for i in range(n_blocks):
                is_first = i == 0
                is_last = i == n_blocks - 1
                extra = {}
                if block_cls is Bottleneck:
                    extra = dict(groups=self.groups, base_width=self.base_width,
                                 se=self.se)
                out, w = block_cls(
                    planes=planes,
                    stride=stride if is_first else 1,
                    has_downsample=is_first
                    and (stride != 1 or inplanes != planes * expansion),
                    sw_norm2=(self.stage_sw[k] and not is_first and i % 2 == 1),
                    ibn_a=self.stage_ibn_a[k],
                    post=self.stage_post[k] if is_last else None,
                    sw_kwargs=self.sw_kwargs,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer{k + 1}_{i}",
                    **extra,
                )(out, train=train)
                if w is not None:
                    w_arr.append(w)
                inplanes = planes * expansion
        return out, w_arr
