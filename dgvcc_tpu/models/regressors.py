"""Generator / DensityRegressor family (reference models/models2.py).

These power the generation/joint scene-style-translation experiments
(configs sta_gen.yml, sta_joint.yml, stb_joint.yml) and the 'dgnet'
baseline of main_base.py:36-37:

  * Generator  (models2.py:29-56): VGG19 encoder [:26] + conv/tanh
    decoder with three x2 upsamples — image-to-image translator;
  * Generator0 (models2.py:58-103): U-Net-ish skip variant;
  * DensityRegressor (models2.py:105-187): VGG16-BN with instance norm
    after every stage, dropout-heavy den/cls heads;
  * DensityRegressorM (models2.py:189-373): models2 twin of DGModel
    'final' — memory bank + cls head, true KL-based JSD, per-view
    binarized cls maps, returns (dc1, dc2, c1, c2, loss_kl, loss_err);
  * DensityRegressorBase / BaseCls (models2.py:375-511): plain
    regressor ('dgnet') / + classifier.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import ConvBlock, Dropout2d, dropout2d, instance_norm, upsample
from dgvcc_tpu.nn.vgg import vgg16bn_stage, vgg19_stage
from dgvcc_tpu.models.dg import MemoryBank


def kl_div_batchmean(log_p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch F.kl_div(log_p, target, reduction='batchmean'):
    sum(target * (log target - log_p)) / batch."""
    t = target.astype(jnp.float32)
    val = t * (jnp.log(jnp.clip(t, 1e-12)) - log_p.astype(jnp.float32))
    return jnp.sum(val) / log_p.shape[0]


def true_jsd(logits1, logits2):
    """models2.py:339-346: 0.5/HW * (KL(pm||p1) + KL(pm||p2)), batchmean.

    logits: (B, P, S) with softmax over the prototype axis S (the
    reference's dim=1 on (B, S, HW) layout)."""
    p1 = jax.nn.softmax(logits1.astype(jnp.float32), axis=-1)
    p2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)
    log_p1 = jax.nn.log_softmax(logits1.astype(jnp.float32), axis=-1)
    log_p2 = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    pm = 0.5 * (p1 + p2)
    hw = logits1.shape[1]  # reference divides by logits.shape[2] = HW
    return 0.5 / hw * (kl_div_batchmean(log_p1, pm) + kl_div_batchmean(log_p2, pm))


@MODELS.register("gen")
class Generator(nn.Module):
    """VGG19[:26] encoder + tanh decoder (models2.py:29-56)."""

    pretrained: bool = True
    # tiny test geometry (dryrun/fast tests): override encoder conv plan
    # and its stop index; production configs never set these
    vgg_cfg: Any = None
    enc_stop: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = vgg19_stage(0, self.enc_stop, dtype=self.dtype, name="enc",
                        cfg=self.vgg_cfg)(x, train=train)
        for i, ch in enumerate((512, 256)):
            y = ConvBlock(ch, bn=True, dtype=self.dtype, name=f"dec{i}")(y, train=train)
        y = upsample(y, 2)
        for i, ch in enumerate((256, 256, 256, 128)):
            y = ConvBlock(ch, bn=True, dtype=self.dtype, name=f"dec2_{i}")(y, train=train)
        y = upsample(y, 2)
        for i, ch in enumerate((128, 64)):
            y = ConvBlock(ch, bn=True, dtype=self.dtype, name=f"dec3_{i}")(y, train=train)
        y = upsample(y, 2)
        y = ConvBlock(64, bn=True, dtype=self.dtype, name="dec4")(y, train=train)
        y = ConvBlock(3, kernel_size=1, padding=0, relu=False, dtype=self.dtype,
                      name="out")(y, train=train)
        return nn.tanh(y)


@MODELS.register("gen0")
class Generator0(nn.Module):
    """Skip-connection generator (models2.py:58-103)."""

    pretrained: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train
        x1 = vgg19_stage(0, 9, dtype=self.dtype, name="enc1")(x, train=t)
        x2 = vgg19_stage(9, 18, dtype=self.dtype, name="enc2")(x1, train=t)
        x3 = vgg19_stage(18, 26, dtype=self.dtype, name="enc3")(x2, train=t)

        y = ConvBlock(512, bn=True, dtype=self.dtype, name="dec3_0")(x3, train=t)
        y = ConvBlock(256, bn=True, dtype=self.dtype, name="dec3_1")(y, train=t)
        y = jnp.concatenate([upsample(y, 2), x2], axis=-1)
        y = ConvBlock(256, bn=True, dtype=self.dtype, name="dec2_0")(y, train=t)
        y = ConvBlock(128, bn=True, dtype=self.dtype, name="dec2_1")(y, train=t)
        y = jnp.concatenate([upsample(y, 2), x1], axis=-1)
        y = ConvBlock(128, bn=True, dtype=self.dtype, name="dec1_0")(y, train=t)
        y = ConvBlock(64, bn=True, dtype=self.dtype, name="dec1_1")(y, train=t)
        y = upsample(y, 2)
        y = ConvBlock(64, bn=True, dtype=self.dtype, name="head0")(y, train=t)
        y = ConvBlock(3, kernel_size=1, padding=0, relu=False, dtype=self.dtype,
                      name="head1")(y, train=t)
        return nn.tanh(y)


class _VGGUNet(nn.Module):
    """Shared VGG16-BN U-Net feature extractor (models2.py:267-290),
    optional per-stage instance norm (DensityRegressor, models2.py:150-155)."""

    stage_in: bool = False
    # tiny test geometry knobs (see models/dg.py — same convention)
    vgg_cfg: Any = None
    stage_splits: Any = (0, 23, 33, 43)
    dec_widths: Any = ((1024, 512), (512, 256), (256, 128))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train
        s0, s1, s2, s3 = self.stage_splits
        (w3a, w3b), (w2a, w2b), (w1a, w1b) = self.dec_widths
        x1 = vgg16bn_stage(s0, s1, dtype=self.dtype, name="stage1",
                           cfg=self.vgg_cfg)(x, train=t)
        if self.stage_in:
            x1 = instance_norm(x1)
        x2 = vgg16bn_stage(s1, s2, dtype=self.dtype, name="stage2",
                           cfg=self.vgg_cfg)(x1, train=t)
        if self.stage_in:
            x2 = instance_norm(x2)
        x3 = vgg16bn_stage(s2, s3, dtype=self.dtype, name="stage3",
                           cfg=self.vgg_cfg)(x2, train=t)
        if self.stage_in:
            x3 = instance_norm(x3)

        y = ConvBlock(w3a, bn=True, dtype=self.dtype, name="dec3_0")(x3, train=t)
        y = ConvBlock(w3b, bn=True, dtype=self.dtype, name="dec3_1")(y, train=t)
        y3 = y
        y = jnp.concatenate([upsample(y, 2), x2], axis=-1)
        y = ConvBlock(w2a, bn=True, dtype=self.dtype, name="dec2_0")(y, train=t)
        y = ConvBlock(w2b, bn=True, dtype=self.dtype, name="dec2_1")(y, train=t)
        y2 = y
        y = jnp.concatenate([upsample(y, 2), x1], axis=-1)
        y = ConvBlock(w1a, bn=True, dtype=self.dtype, name="dec1_0")(y, train=t)
        y1 = ConvBlock(w1b, bn=True, dtype=self.dtype, name="dec1_1")(y, train=t)

        y_cat = jnp.concatenate([y1, upsample(y2, 2), upsample(y3, 4)], axis=-1)
        return y_cat, x3


def _binarize(c, thrs=0.5):
    return jax.lax.stop_gradient(jnp.where(c >= thrs, 1.0, 0.0).astype(c.dtype))


@MODELS.register("dgnet")
class DensityRegressorBase(nn.Module):
    """Plain regressor, main_base 'dgnet' (models2.py:375-432)."""

    pretrained: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fe = _VGGUNet(dtype=self.dtype)
        self.den_dec = ConvBlock(256, kernel_size=1, padding=0, dtype=self.dtype)
        self.den_drop = Dropout2d(0.5)
        self.den_head = ConvBlock(1, kernel_size=1, padding=0, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        y_cat, _ = self.fe(x, train=train)
        y = self.den_drop(self.den_dec(y_cat, train=train), train=train)
        d = self.den_head(y, train=train)
        return upsample(d, 4)


@MODELS.register("dgnet_cls")
class DensityRegressorBaseCls(nn.Module):
    """Base + classifier head (models2.py:434-511); returns (dc, (d, c))."""

    pretrained: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fe = _VGGUNet(dtype=self.dtype)
        self.den_dec = ConvBlock(256, kernel_size=1, padding=0, dtype=self.dtype)
        self.den_drop = Dropout2d(0.5)
        self.cls_dec = ConvBlock(256, dtype=self.dtype)
        self.cls_drop = Dropout2d(0.5)
        self.den_head = ConvBlock(1, kernel_size=1, padding=0, dtype=self.dtype)
        self.cls_out = ConvBlock(1, kernel_size=1, padding=0, relu=False, dtype=self.dtype)

    def __call__(self, x, c_gt=None, train: bool = False):
        y_cat, x3 = self.fe(x, train=train)
        y_den = self.den_drop(self.den_dec(y_cat, train=train), train=train)
        y_cls = self.cls_drop(self.cls_dec(x3, train=train), train=train)
        c = nn.sigmoid(self.cls_out(y_cls, train=train))
        new_c = c_gt if c_gt is not None else _binarize(c)
        resized_c = upsample(new_c, 4, mode="nearest")
        d = self.den_head(y_den, train=train)
        dc = upsample(d * resized_c, 4)
        return dc, (d, c)


@MODELS.register("reg")
class DensityRegressor(nn.Module):
    """IN-after-stage variant with deep dropout heads (models2.py:105-187);
    returns (dc, d, c, x3)."""

    pretrained: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        self.fe = _VGGUNet(stage_in=True, dtype=d)
        self.den_head_blocks = [
            ConvBlock(256, kernel_size=1, padding=0, dtype=d),
            ConvBlock(256, dtype=d),
            ConvBlock(256, dtype=d),
        ]
        self.den_out = ConvBlock(1, kernel_size=1, padding=0, dtype=d)
        self.cls_head_blocks = [
            ConvBlock(256, dtype=d),
            ConvBlock(256, dtype=d),
            ConvBlock(256, dtype=d),
        ]
        self.cls_out = ConvBlock(1, kernel_size=1, padding=0, relu=False, dtype=d)
        self.drops = [Dropout2d(0.2) for _ in range(6)]

    def __call__(self, x, c_gt=None, train: bool = False):
        y_cat, x3 = self.fe(x, train=train)
        y = y_cat
        for blk, drop in zip(self.den_head_blocks, self.drops[:3]):
            y = drop(blk(y, train=train), train=train)
        d = self.den_out(y, train=train)

        yc = x3
        for blk, drop in zip(self.cls_head_blocks, self.drops[3:]):
            yc = drop(blk(yc, train=train), train=train)
        c = nn.sigmoid(self.cls_out(yc, train=train))

        new_c = c_gt if c_gt is not None else _binarize(c)
        resized_c = upsample(new_c, 4, mode="nearest")
        dc = upsample(d * resized_c, 4)
        return dc, d, c, x3


@MODELS.register("reg_mem")
class DensityRegressorM(nn.Module):
    """models2 twin of DGModel 'final' (models2.py:189-373).

    __call__(x, c_gt=None, raw=True) → (dc, c)
    forward_train(img1, img2, c_gt) → (dc1, dc2, c1, c2, loss_kl, loss_err)
    """

    pretrained: bool = True
    thrs: float = 0.5
    part_num: int = 1024
    final_dim: int = 256
    fused_mem: bool = False  # Pallas attention on the inference path
    # tiny test geometry knobs (see models/dg.py — same convention)
    vgg_cfg: Any = None
    stage_splits: Any = (0, 23, 33, 43)
    dec_widths: Any = ((1024, 512), (512, 256), (256, 128))
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        self.fe = _VGGUNet(vgg_cfg=self.vgg_cfg, stage_splits=self.stage_splits,
                           dec_widths=self.dec_widths, dtype=d)
        self.den_dec = ConvBlock(self.final_dim, kernel_size=1, padding=0, bn=True, dtype=d)
        self.memory = MemoryBank(self.part_num, self.final_dim,
                                 fused=self.fused_mem, dtype=d)
        self.den_head = ConvBlock(1, kernel_size=1, padding=0, dtype=d)
        self.cls_conv1 = ConvBlock(self.dec_widths[1][1], bn=True, dtype=d)
        self.cls_drop = Dropout2d(0.5)
        self.cls_conv2 = ConvBlock(1, kernel_size=1, padding=0, relu=False, dtype=d)

    def cls_head(self, x3, train=False):
        c = self.cls_conv1(x3, train=train)
        c = self.cls_drop(c, train=train)
        return nn.sigmoid(self.cls_conv2(c, train=train))

    def __call__(self, x, c_gt=None, raw: bool = True, train: bool = False):
        y_cat, x3 = self.fe(x, train=train)
        y_den = self.den_dec(y_cat, train=train)
        # inference discards the logits — skip materializing the (B, HW, S)
        # attention tensor (and use the fused kernel when enabled)
        y_new, _ = self.memory(y_den, need_logits=False)
        if not raw:
            y_new = jax.lax.stop_gradient(y_new)  # models2.py:298-300
        c = self.cls_head(x3, train=train)
        new_c = c_gt if c_gt is not None else _binarize(c, self.thrs)
        resized_c = upsample(new_c, 4, mode="nearest")
        d = self.den_head(y_new, train=train)
        dc = upsample(d * resized_c, 4)
        return dc, c

    def forward_train(self, img1, img2, c_gt=None):
        train = True
        y_cat1, x3_1 = self.fe(img1, train=train)
        y_cat2, x3_2 = self.fe(img2, train=train)
        y_den1 = self.den_dec(y_cat1, train=train)
        y_den2 = self.den_dec(y_cat2, train=train)
        y_in1 = instance_norm(y_den1.astype(jnp.float32))
        y_in2 = instance_norm(y_den2.astype(jnp.float32))
        e_mask = jax.lax.stop_gradient(
            (jnp.abs(y_in1 - y_in2) < 0.5).astype(y_den1.dtype)
        )
        # NOTE dropout BEFORE the mask here (models2.py:331-332),
        # unlike models.py:313-314 which masks first
        r1 = self.make_rng("dropout")
        r2 = self.make_rng("dropout")
        y_m1 = dropout2d(y_den1, 0.5, r1) * e_mask
        y_m2 = dropout2d(y_den2, 0.5, r2) * e_mask
        loss_err = jnp.mean(jnp.abs(y_in1 - y_in2))

        y_new1, logits1 = self.memory(y_m1)
        y_new2, logits2 = self.memory(y_m2)
        loss_kl = true_jsd(logits1, logits2)

        c1 = self.cls_head(x3_1, train=train)
        c2 = self.cls_head(x3_2, train=train)
        if c_gt is not None:
            c_new1 = c_new2 = c_gt
        else:
            c_new1 = _binarize(c1, self.thrs)
            c_new2 = _binarize(c2, self.thrs)
        c_r1 = upsample(c_new1, 4, mode="nearest")
        c_r2 = upsample(c_new2, 4, mode="nearest")

        d1 = self.den_head(y_new1, train=train)
        d2 = self.den_head(y_new2, train=train)
        dc1 = upsample(d1 * c_r1, 4)
        dc2 = upsample(d2 * c_r2, 4)
        return dc1, dc2, c1, c2, loss_kl, loss_err


def get_models():
    """(Generator, DensityRegressorM) pair (models2.py:513-516)."""
    return Generator(), DensityRegressorM()


def get_basemodel():
    return DensityRegressorBase()
