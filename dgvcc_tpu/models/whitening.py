"""DG-baseline counters: SW / IBN / ISW (+ SW-VGG).

Reference: models/SW/__init__.py:4-42, models/ibnnet/__init__.py:11-28,
models/ISW/__init__.py:21-122. All share the trunk-through-layer3
(1024 ch, stride 16) + 3-conv head + bilinear x16 upsample shape.

ISW three-phase protocol (ISW/__init__.py:70-122), made jit-pure:
  (a) training forward returns [count_loss, whitening_loss] — the
      whitening loss needs per-layer covariance MASKS, passed in as
      arrays (no hidden Python state inside the compiled step);
  (b) covariance-statistics pass: two augmented views are concatenated
      and the per-layer variance-of-covariance returned; the host-side
      :class:`IswCovTracker` accumulates them during validation
      (replacing CovMatrix_ISW's mutable buffers, cov_settings.py:84-89);
  (c) eval forward returns the density map.
Mask selection (cov_settings.py:52-81) runs on host: top-k over the
accumulated variance-of-covariance, with k from the relax_denom margin
or from 1-D k-means cluster-0 counting. The k-means is the EXACT
dynamic-programming algorithm of the reference's kmeans1d dependency
(utils/kmeans1d.py: C++ fast path + numpy fallback), so mask selection
is provably identical. :class:`IrwCovTracker` supplies the static IRW
masks (wt_layer code 1, cov_settings.py:91-107): the full off-diagonal
with a relax_denom margin.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import upsample
from dgvcc_tpu.nn.resnet import ResNetTrunk
from dgvcc_tpu.nn.vgg import VGG19_CFG
from dgvcc_tpu.nn.whitening import (
    SwitchWhiten,
    get_covariance_matrix,
    instance_whitening_loss,
)

SW_KW = dict(num_pergroup=16, sw_type=2, T=5, tie_weight=False, momentum=0.9,
             affine=True)  # sw_cfg, models/SW/__init__.py:4-10


class CountingHead(nn.Module):
    """1024 → 512 → 256 → 1 conv head + bilinear x16 upsample
    (SW/__init__.py:30-37 et al.)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(512, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv3")(x)
        # nn.UpsamplingBilinear2d = align_corners=True (SW/__init__.py:36)
        return upsample(x, 16, align_corners=True)


@MODELS.register("sw")
class SWCounterResNet(nn.Module):
    """SWCounter_ResNet (SW/__init__.py:24-42): resnet-SW through
    layer3 + head. ``depth`` selects the torchvision geometry — the
    reference counter hard-codes resnet50 but its backbone zoo defines
    18/34/50/101/152 (SW/backbones/resnet.py:217-294)."""

    pretrained: bool = True
    depth: int = 50
    axis_name: Optional[str] = None
    layers: Optional[Sequence[int]] = None  # test override (tiny nets)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from dgvcc_tpu.nn.resnet import RESNET_BLOCK, RESNET_LAYERS

        sw_kwargs = dict(SW_KW, axis_name=self.axis_name)
        feats, _ = ResNetTrunk(
            layers=self.layers or RESNET_LAYERS[self.depth],
            block=RESNET_BLOCK[self.depth], num_stages=3, stem_norm="sw",
            stage_sw=(True, True, True, False), sw_kwargs=sw_kwargs,
            axis_name=self.axis_name, dtype=self.dtype, name="backbone",
        )(x, train=train)
        return CountingHead(dtype=self.dtype, name="head")(feats)


@MODELS.register("sw_densenet")
class SWCounterDenseNet(nn.Module):
    """DenseNet-SW counter: the reference ships the SW DenseNet backbone
    (models/SW/backbones/densenet.py:78-201, norm0 + every-3rd norm1 →
    SwitchWhiten in stages 1-3) but never attaches a head; here it feeds
    the standard counting head at the denseblock3 cut (stride 16)."""

    pretrained: bool = True
    depth: int = 121
    axis_name: Optional[str] = None
    block_config: Optional[Sequence[int]] = None  # test override
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from dgvcc_tpu.nn.densenet import DENSENET_CONFIGS, DenseNetTrunk

        cfg = dict(DENSENET_CONFIGS[self.depth])
        if self.block_config is not None:
            cfg["block_config"] = self.block_config
        feats = DenseNetTrunk(
            num_stages=3, norm1_mode="sw", stage_with=(True, True, True, False),
            sw_kwargs=dict(SW_KW, axis_name=self.axis_name),
            axis_name=self.axis_name, dtype=self.dtype, name="backbone", **cfg,
        )(x, train=train)
        return CountingHead(dtype=self.dtype, name="head")(feats)


@MODELS.register("sw_vgg")
class SWCounterVGG(nn.Module):
    """SWCounter_VGG (SW/__init__.py:12-22 → SW/backbones/vgg.py:16-62):
    the FULL VGG19 conv stack (cfg 'E' minus the trailing pool — 16
    convs, 4 pools, stride 16, SW after every conv), then x2 bilinear
    upsample, 512→256→128→1 reg head, |output|, and the counter's x8
    upsample back to full resolution."""

    pretrained: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sw_kwargs = dict(SW_KW, axis_name=self.axis_name)
        idx = 0
        for v in VGG19_CFG[:-1]:  # cfg 'E' without the trailing 'M'
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                            name=f"conv{idx}")(x)
                x = SwitchWhiten(v, dtype=self.dtype, name=f"sw{idx}",
                                 **sw_kwargs)(x, train=train)
                x = nn.relu(x)
            idx += 1
        # F.upsample_bilinear = align_corners=True (SW/backbones/vgg.py:49)
        x = upsample(x, 2, align_corners=True)  # stride 16 → 8
        x = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="reg1")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="reg2")(x)
        x = nn.relu(x)
        x = jnp.abs(nn.Conv(1, (1, 1), dtype=self.dtype, name="reg3")(x))
        # nn.UpsamplingBilinear2d(8) = align_corners=True (SW/__init__.py:17)
        return upsample(x, 8, align_corners=True)


@MODELS.register("ibn")
class IBNCounterResNet(nn.Module):
    """IBNCounter_ResNet (ibnnet/__init__.py:11-28): resnet50_ibn_b
    through layer3 + head. ibn_cfg ('b','b',None,None): IN(affine) stem
    + post-residual IN in the last blocks of stages 1-2.

    The reference's IBN-Net zoo also defines the 'a' config (IBN as bn1
    of every block in stages 1-3, resnet_ibn.py:26-68), ResNeXt-IBN-a
    (resnext_ibn.py:145-172, baseWidth=4 cardinality=32) and
    SE-ResNet-IBN-a (se_resnet_ibn.py:129-164) — selectable here via
    ``ibn_cfg``/``groups``/``base_width``/``se`` though only
    resnet50_ibn_b is consumed by the shipped counter."""

    pretrained: bool = True
    depth: int = 50
    ibn_cfg: str = "b"  # 'a' | 'b'
    groups: int = 1
    base_width: int = 64
    se: bool = False
    axis_name: Optional[str] = None
    layers: Optional[Sequence[int]] = None  # test override (tiny nets)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from dgvcc_tpu.nn.resnet import RESNET_BLOCK, RESNET_LAYERS

        if self.ibn_cfg == "b":
            spec = dict(stem_norm="in_affine",
                        stage_post=("in", "in", None, None))
        else:  # 'a': IBN bn1 in stages 1-3 (resnet_ibn.py:26-68)
            spec = dict(stem_norm="bn",
                        stage_ibn_a=(True, True, True, False))
        feats, _ = ResNetTrunk(
            layers=self.layers or RESNET_LAYERS[self.depth],
            block=RESNET_BLOCK[self.depth], num_stages=3,
            groups=self.groups, base_width=self.base_width, se=self.se,
            axis_name=self.axis_name, dtype=self.dtype, name="backbone",
            **spec,
        )(x, train=train)
        return CountingHead(dtype=self.dtype, name="head")(feats)


@MODELS.register("ibn_densenet")
class IBNCounterDenseNet(nn.Module):
    """DenseNet-IBN-a counter: the reference ships densenet{121,169,
    201,161}_ibn_a backbones (models/ibnnet/densenet_ibn.py:43-97,
    BN-first IBN(0.4) at every 3rd norm1 of stages 1-3) without a
    counter; here one feeds the standard head at the denseblock3 cut."""

    pretrained: bool = True
    depth: int = 121
    axis_name: Optional[str] = None
    block_config: Optional[Sequence[int]] = None  # test override
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from dgvcc_tpu.nn.densenet import DENSENET_CONFIGS, DenseNetTrunk

        cfg = dict(DENSENET_CONFIGS[self.depth])
        if self.block_config is not None:
            cfg["block_config"] = self.block_config
        feats = DenseNetTrunk(
            num_stages=3, norm1_mode="ibn", stage_with=(True, True, True, False),
            axis_name=self.axis_name, dtype=self.dtype, name="backbone", **cfg,
        )(x, train=train)
        return CountingHead(dtype=self.dtype, name="head")(feats)


class _ISWNet(nn.Module):
    """Trunk + head; returns (density, w_arr)."""

    axis_name: Optional[str] = None
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats, w_arr = ResNetTrunk(
            layers=self.layers, num_stages=3, stem_norm="iw",
            stage_post=("iw", "iw", None, None), axis_name=self.axis_name,
            dtype=self.dtype, name="backbone",
        )(x, train=train)
        d = CountingHead(dtype=self.dtype, name="head")(feats)
        return d, w_arr


# channel widths of the three whitening sites (stem, layer1, layer2)
ISW_WT_CHANNELS = (64, 256, 512)


@MODELS.register("isw")
class ISWCounterResNet(nn.Module):
    """ISWCounter_ResNet (ISW/__init__.py:21-122), jit-pure.

    __call__(x, train=False)                      → density map
    __call__(x, gts=..., masks=..., num_sensitive=...,
             apply_wtloss=..., train=True)        → [count_loss, wt_loss]
    cov_stats(x2)                                 → per-layer var-of-cov
        (x2 = concat of the two augmented views, ISW/__init__.py:73-104)
    """

    pretrained: bool = True
    relax_denom: float = 2.0
    clusters: int = 3
    log_para: float = 1000.0
    axis_name: Optional[str] = None
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    def setup(self):
        self.net = _ISWNet(axis_name=self.axis_name, layers=self.layers,
                           dtype=self.dtype)

    def __call__(self, x, gts=None, masks=None, num_sensitive=None,
                 margins=None, apply_wtloss=True, train: bool = False):
        d, w_arr = self.net(x, train=train)
        if not train:
            return d
        loss1 = jnp.mean((d.astype(jnp.float32) - gts.astype(jnp.float32)) ** 2)
        wt_loss = jnp.float32(0.0)
        if masks is not None:
            for i, w in enumerate(w_arr):
                margin = margins[f"m{i}"] if margins is not None else 0.0
                wt_loss = wt_loss + instance_whitening_loss(
                    w, masks[f"m{i}"], margin, num_sensitive[f"m{i}"]
                )
            wt_loss = wt_loss / len(w_arr)
        wt_loss = jnp.where(jnp.asarray(apply_wtloss), wt_loss, 0.0)
        return [loss1, wt_loss]

    def cov_stats(self, x2):
        """Variance (over the concatenated-view batch) of off-diagonal
        covariance entries, per whitening site (ISW/__init__.py:93-104)."""
        _, w_arr = self.net(x2, train=False)
        out = {}
        for i, w in enumerate(w_arr):
            c = w.shape[-1]
            f_cor = get_covariance_matrix(w)  # (B, C, C)
            rev_eye = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)
            off = f_cor * rev_eye
            out[f"m{i}"] = jnp.var(off, axis=0, ddof=1)
        return out


# ---------------------------------------------------------------------------
# Host-side covariance tracking + mask selection (CovMatrix_ISW role)
# ---------------------------------------------------------------------------

def kmeans_1d(values: np.ndarray, k: int):
    """Exact 1-D k-means (utils/kmeans1d.py — the reference's kmeans1d
    package algorithm, cov_settings.py:58). Returns (labels, centroids)
    with centroids sorted ascending — cluster 0 = smallest values (the
    'insensitive' covariances, cov_settings.py:57-59)."""
    from dgvcc_tpu.utils.kmeans1d import cluster

    labels, cents = cluster(values, k)
    return np.asarray(labels, np.int64), np.asarray(cents, np.float64)


class IswCovTracker:
    """Accumulates variance-of-covariance per whitening site and derives
    the sensitive-entry masks (reference cov_settings.py:16-89)."""

    def __init__(self, dims: Sequence[int] = ISW_WT_CHANNELS,
                 relax_denom: float = 2.0, clusters: int = 3):
        self.dims = list(dims)
        self.relax_denom = relax_denom
        self.clusters = clusters
        self.reset()

    def reset(self):
        self.var = [None] * len(self.dims)
        self.count = 0
        self.masks: Optional[List[np.ndarray]] = None
        self.num_sensitive = [0.0] * len(self.dims)

    def add(self, var_covs: Dict[str, np.ndarray]):
        for i in range(len(self.dims)):
            v = np.asarray(var_covs[f"m{i}"], np.float64)
            self.var[i] = v if self.var[i] is None else self.var[i] + v
        self.count += 1

    def has_stats(self) -> bool:
        return self.count > 0

    def set_mask_matrix(self):
        """Select sensitive covariance entries (cov_settings.py:52-77)."""
        masks, nums = [], []
        for i, dim in enumerate(self.dims):
            var_matrix = self.var[i] / max(self.count, 1)
            flat = var_matrix.ravel()
            num_off = dim * (dim - 1) // 2
            if self.relax_denom == 0:
                labels, _ = kmeans_1d(flat, self.clusters)
                num_sensitive = int(flat.size - np.sum(labels == 0))
            else:
                margin = num_off // self.relax_denom
                num_sensitive = int(num_off - margin)
            idx = np.argsort(flat)[::-1][:num_sensitive]
            m = np.zeros(flat.size, np.float32)
            m[idx] = 1.0
            m = m.reshape(dim, dim)
            # intersect with a previously selected mask (cov_settings.py:69-72)
            if self.masks is not None:
                m = (self.masks[i].astype(np.int32) & m.astype(np.int32)).astype(np.float32)
            masks.append(m)
            nums.append(float(m.sum()))
        self.masks = masks
        self.num_sensitive = nums
        self.var = [None] * len(self.dims)
        self.count = 0

    def mask_batch(self):
        """(masks, nums, margins) as jit-friendly dicts; identity-
        permissive default (all-zero masks → zero wt loss) before any
        stats exist. ISW margins are always 0 (cov_settings.py:47)."""
        if self.masks is None:
            masks = [np.zeros((d, d), np.float32) for d in self.dims]
            nums = [1.0] * len(self.dims)
        else:
            masks, nums = self.masks, self.num_sensitive
        return (
            {f"m{i}": jnp.asarray(m) for i, m in enumerate(masks)},
            {f"m{i}": jnp.asarray(n, jnp.float32) for i, n in enumerate(nums)},
            {f"m{i}": jnp.float32(0.0) for i in range(len(self.dims))},
        )


class IrwCovTracker:
    """CovMatrix_IRW role (cov_settings.py:91-107): the mask is the
    STATIC full off-diagonal (upper triangle), with a relax_denom margin
    subtracted inside the whitening loss and the full off-diagonal count
    as denominator (ISW/__init__.py:115-116 via get_mask_matrix). No
    covariance statistics are accumulated — the trainer's covstat pass
    and set_mask_matrix are no-ops."""

    def __init__(self, dims: Sequence[int] = ISW_WT_CHANNELS,
                 relax_denom: float = 0.0, clusters: int = 0):
        self.dims = list(dims)
        self.relax_denom = relax_denom

    def reset(self):
        pass

    def add(self, var_covs):
        pass

    def has_stats(self) -> bool:
        return False

    def set_mask_matrix(self):
        pass

    def mask_batch(self):
        masks, nums, margins = {}, {}, {}
        for i, d in enumerate(self.dims):
            num_off = d * (d - 1) // 2
            margin = num_off // self.relax_denom if self.relax_denom else 0
            masks[f"m{i}"] = jnp.asarray(
                np.triu(np.ones((d, d), np.float32), k=1))
            nums[f"m{i}"] = jnp.float32(num_off)
            margins[f"m{i}"] = jnp.float32(margin)
        return masks, nums, margins
