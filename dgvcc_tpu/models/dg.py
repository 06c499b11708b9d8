"""The DGModel family — the paper's contribution.

Re-design of /root/reference/models/models.py:29-335 (DGModel_base /
mem / memadd / cls / memcls / final) as one configurable flax module:

  * VGG16-BN encoder split at torchvision features [:23] / [23:33] /
    [33:43] → strides 4 / 8 / 16 with 256 / 512 / 512 channels;
  * U-Net-ish decoder; multi-scale concat (128+256+512 ch at stride 4);
  * optional attention **memory bank** (models.py:116-125): every pixel
    feature is re-expressed as a convex combination of mem_size learned
    domain-invariant prototypes — two batched matmuls + a softmax,
    which XLA maps straight onto the MXU;
  * optional **foreground classifier head** on the stride-16 features
    (models.py:193-198);
  * two-view consistency training (models.py:298-335): instance-norm
    error masking, channel dropout, JSD-as-MSE on memory logits.

Everything is NHWC and static-shaped; train/eval switches are Python
bools (static under jit), so each mode compiles to one fused program.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import ConvBlock, Dropout2d, dropout2d, instance_norm, upsample


class MemoryBank(nn.Module):
    """Attention over a learned prototype bank (reference models.py:116-125).

    y: (B, H, W, K). logits[b, p, s] = <y[b,p,:], mem[:,s]> / sqrt(K);
    attention softmax over the prototype axis s; output is the convex
    combination of prototypes. Both contractions are MXU matmuls of
    shape (HW, K) x (K, S) and (HW, S) x (S, K).

    ``tp_axis``: tensor-parallel mesh axis. The bank param shards over
    its prototype axis (each device holds S/n prototypes — the step
    builder's in_specs do the sharding); the softmax normalizes GLOBALLY
    via pmax+psum and the back-projection psum-reduces — the same
    decomposition as parallel/tp.py, here usable INSIDE the jitted
    training step. With tp_axis set the second return value is the
    local slice of the f32 attention PROBABILITIES (already globally
    normalized), not raw logits.
    """

    mem_size: int = 1024
    mem_dim: int = 256
    fused: bool = False  # Pallas kernel on the logits-free inference path
    # two-view TRAINING pair() path: None = auto (fused Pallas train
    # kernel on TPU, einsum twin elsewhere), True/False = explicit
    fused_train: Any = None
    tp_axis: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        # under TP the param leaf arriving in apply is the LOCAL shard —
        # init declares the local shape (init always happens with a
        # tp-free twin, outside shard_map)
        def init(rng):
            s_local = (self.mem_size if self.tp_axis is None
                       else self.mem_size
                       // jax.lax.axis_size(self.tp_axis))
            return jax.random.normal(rng, (self.mem_dim, s_local),
                                     jnp.float32)

        self.mem = self.param("mem", init)

    def pair(self, y1, y2):
        """Two-view training attention + consistency loss in ONE op.

        Returns (y_new1, y_new2, loss_con) where loss_con =
        mean((softmax(l1) - softmax(l2))^2) — exactly the einsum path's
        jsd_as_mse(logits1, logits2) composition. On TPU this runs the
        fused Pallas training kernel (ops/mem_attention_train.py):
        neither view's (B, P, S) logits/probabilities ever materialize
        in HBM, and the custom VJP recomputes tiles in the backward —
        measured 18.1 ms -> ~4 ms of the 116 ms train step."""
        b, h, w, k = y1.shape
        assert k == self.mem_dim, (
            f"MemoryBank mem_dim={self.mem_dim} but input has {k} channels")
        from dgvcc_tpu.ops.mem_attention_train import (
            memory_attention_train, memory_attention_train_reference)

        mem = self.mem.astype(self.dtype)
        y1f = y1.reshape(b, h * w, k)
        y2f = y2.reshape(b, h * w, k)
        use_kernel = (self.fused_train if self.fused_train is not None
                      else jax.default_backend() == "tpu")
        fn = (memory_attention_train if use_kernel
              else memory_attention_train_reference)
        o1, o2, con = fn(y1f, y2f, mem)
        return (o1.reshape(b, h, w, k), o2.reshape(b, h, w, k), con)

    def __call__(self, y, need_logits: bool = True):
        b, h, w, k = y.shape
        # the bank's feature dim comes from the input; mem_dim documents
        # the intent and must agree
        assert k == self.mem_dim, (
            f"MemoryBank mem_dim={self.mem_dim} but input has {k} channels")
        mem = self.mem.astype(self.dtype)
        y_flat = y.reshape(b, h * w, k)

        # fused path only from batch 4: the kernel wins +15% at B>=4
        # (1.11 ms/frame at B=16 768x1024) but integrates 40% SLOWER at
        # B=1 (13.1 vs 9.4 ms/frame; B=2 also loses) — measured on v5e,
        # BENCH_NOTES round 5 "fused memory attention batch crossover".
        # b is static at trace time, so each batch bucket gets the
        # faster graph with no runtime branch.
        if self.fused and b >= 4 and not need_logits and self.tp_axis is None:
            # fused VMEM-resident attention (ops/mem_attention.py): skips
            # materializing the (B, P, S) attention tensor in HBM
            from dgvcc_tpu.ops.mem_attention import memory_attention_fused

            y_new = memory_attention_fused(y_flat, mem)
            return y_new.reshape(b, h, w, k), None

        logits = jnp.einsum(
            "bpk,ks->bps", y_flat, mem, preferred_element_type=jnp.float32
        ) / math.sqrt(k)
        if self.tp_axis is not None:
            # global softmax over the sharded prototype axis. The max
            # shift is numerical-stability-only (its gradient cancels in
            # softmax), so stop_gradient sidesteps pmax's missing VJP
            # exactly.
            gmax = jax.lax.pmax(
                jnp.max(jax.lax.stop_gradient(logits), axis=-1),
                self.tp_axis)
            e = jnp.exp(logits - gmax[..., None])
            z = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True),
                             self.tp_axis)
            probs = e / z
            y_new = jax.lax.psum(
                jnp.einsum("bps,sk->bpk", probs.astype(self.dtype), mem.T,
                           preferred_element_type=jnp.float32),
                self.tp_axis).astype(y.dtype)
            return y_new.reshape(b, h, w, k), probs
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        y_new = jnp.einsum(
            "bps,sk->bpk", attn, mem.T, preferred_element_type=jnp.float32
        ).astype(y.dtype)
        return y_new.reshape(b, h, w, k), logits


def jsd_as_mse(logits1: jnp.ndarray, logits2: jnp.ndarray) -> jnp.ndarray:
    """Consistency loss: MSE between prototype softmaxes (models.py:148-158).

    The reference calls it jsd but computes F.mse_loss(softmax, softmax).
    Softmax over the prototype axis (our last axis).
    """
    p1 = jax.nn.softmax(logits1.astype(jnp.float32), axis=-1)
    p2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)
    return jnp.mean((p1 - p2) ** 2)


class DGModel(nn.Module):
    """Configurable DG counter. Variants (reference class → flags):

    base    → use_mem=False, use_cls=False
    mem     → use_mem=True,  use_cls=False
    memadd  → mem + two-view forward_train (no cls)
    cls     → use_mem=False, use_cls=True
    memcls  → use_mem=True,  use_cls=True
    final   → memcls + two-view forward_train with cls-map fusion
    """

    use_mem: bool = False
    use_cls: bool = False
    mem_size: int = 1024
    mem_dim: int = 256
    den_dropout: float = 0.5
    cls_dropout: float = 0.5
    cls_thrs: float = 0.5
    err_thrs: float = 0.5
    has_err_loss: bool = False
    # base/mem apply Dropout2d inside den_dec (models.py:55-58,107-110);
    # memadd/final leave den_dec dropout-free and apply masked dropout in
    # forward_train (models.py:144-146,282-284). 'auto' resolves by variant.
    den_dec_dropout: bool = True
    pretrained: bool = True  # honored by the weight loader, not the graph
    fused_mem: bool = False  # Pallas memory attention on inference (TPU)
    # fused two-view TRAINING attention (ops/mem_attention_train.py):
    # None = auto (Pallas kernel on TPU, einsum twin elsewhere)
    fused_mem_train: Any = None
    tp_axis: Any = None  # shard the memory bank over this mesh axis (TP)
    remat: bool = False  # rematerialize encoder stages (memory ↓, FLOPs ↑)
    # perf knob: run the two training views as ONE 2B batch through the
    # encoder/decoder/heads instead of two sequential B-sized passes.
    # Touches BatchNorm semantics only: train-mode statistics (and the
    # running-stat update) are computed over the union of the views
    # rather than per view (the reference runs per-view,
    # models.py:298-335). Everything else is bit-equivalent.
    batched_two_view: bool = False
    # tiny test geometry: override the encoder conv plan / stage splits /
    # decoder widths (defaults = the reference torchvision VGG16-BN
    # splits, models.py:35-38). Used by the multi-chip dryrun and fast
    # tests to keep compile + 1-core execution time bounded; production
    # configs never set these.
    vgg_cfg: Any = None
    stage_splits: Any = (0, 23, 33, 43)
    dec_widths: Any = ((1024, 512), (512, 256), (256, 128))
    dtype: Any = jnp.float32

    def setup(self):
        from dgvcc_tpu.nn.vgg import VGG16_CFG, VGGFeatures, feature_layout

        # static_argnums counts (scope, x, train): `train` must be static
        # and passed POSITIONALLY at every call site
        stage_cls = (
            nn.remat(VGGFeatures, static_argnums=(2,)) if self.remat
            else VGGFeatures
        )

        cfg = tuple(VGG16_CFG if self.vgg_cfg is None else self.vgg_cfg)
        s0, s1, s2, s3 = self.stage_splits
        # a vgg_cfg override with stale stage_splits would make
        # VGGFeatures silently skip every out-of-range index (identity
        # stages, degenerate model) — fail loudly instead
        n = len(feature_layout(cfg, True))
        if not (0 <= s0 < s1 < s2 < s3 <= n):
            raise ValueError(
                f"stage_splits {tuple(self.stage_splits)} do not address "
                f"the {n}-slot feature layout of this vgg_cfg — override "
                f"stage_splits together with vgg_cfg")

        def stage(lo, hi):
            return stage_cls(cfg=cfg, batch_norm=True,
                             start=lo, stop=hi, dtype=self.dtype)

        self.enc1 = stage(s0, s1)
        self.enc2 = stage(s1, s2)
        self.enc3 = stage(s2, s3)

        (w3a, w3b), (w2a, w2b), (w1a, w1b) = self.dec_widths
        self.dec3 = [
            ConvBlock(w3a, bn=True, dtype=self.dtype),
            ConvBlock(w3b, bn=True, dtype=self.dtype),
        ]
        self.dec2 = [
            ConvBlock(w2a, bn=True, dtype=self.dtype),
            ConvBlock(w2b, bn=True, dtype=self.dtype),
        ]
        self.dec1 = [
            ConvBlock(w1a, bn=True, dtype=self.dtype),
            ConvBlock(w1b, bn=True, dtype=self.dtype),
        ]

        den_ch = self.mem_dim if self.use_mem else 2 * w1b
        self.den_dec = ConvBlock(den_ch, kernel_size=1, padding=0, bn=True, dtype=self.dtype)
        self.den_drop = Dropout2d(self.den_dropout)
        self.den_head = ConvBlock(1, kernel_size=1, padding=0, dtype=self.dtype)

        if self.use_mem:
            self.memory = MemoryBank(self.mem_size, self.mem_dim,
                                     fused=self.fused_mem,
                                     fused_train=self.fused_mem_train,
                                     tp_axis=self.tp_axis, dtype=self.dtype)
        if self.use_cls:
            self.cls_conv1 = ConvBlock(w2b, bn=True, dtype=self.dtype)
            self.cls_drop = Dropout2d(self.cls_dropout)
            self.cls_conv2 = ConvBlock(1, kernel_size=1, padding=0, relu=False, dtype=self.dtype)

    # ---- building blocks -------------------------------------------------

    def forward_fe(self, x, train: bool = False):
        """Encoder + decoder; returns (multi-scale concat, stride-16 feats).

        Parity: models.py:64-87. y_cat = [dec1(128), up2(dec2(256)),
        up4(dec3(512))] at stride 4 → 896 channels.
        """
        x1 = self.enc1(x, train)   # stride 4, 256
        x2 = self.enc2(x1, train)  # stride 8, 512
        x3 = self.enc3(x2, train)  # stride 16, 512

        y = x3
        for blk in self.dec3:
            y = blk(y, train=train)
        y3 = y
        y = upsample(y, 2)
        y = jnp.concatenate([y, x2], axis=-1)
        for blk in self.dec2:
            y = blk(y, train=train)
        y2 = y
        y = upsample(y, 2)
        y = jnp.concatenate([y, x1], axis=-1)
        for blk in self.dec1:
            y = blk(y, train=train)
        y1 = y

        y_cat = jnp.concatenate([y1, upsample(y2, 2), upsample(y3, 4)], axis=-1)
        return y_cat, x3

    def _den_features(self, y_cat, train: bool):
        y = self.den_dec(y_cat, train=train)
        if self.den_dec_dropout:
            y = self.den_drop(y, train=train)
        return y

    def cls_head(self, x3, train: bool = False):
        """Foreground classifier on stride-16 features (models.py:193-198)."""
        c = self.cls_conv1(x3, train=train)
        c = self.cls_drop(c, train=train)
        c = self.cls_conv2(c, train=train)
        return nn.sigmoid(c)

    def transform_cls_map_gt(self, c_gt):
        return upsample(c_gt, 4, mode="nearest")

    def transform_cls_map_pred(self, c):
        c_bin = jax.lax.stop_gradient(jnp.where(c >= self.cls_thrs, 1.0, 0.0))
        return upsample(c_bin.astype(c.dtype), 4, mode="nearest")

    # ---- inference forward -----------------------------------------------

    def __call__(self, x, c_gt=None, train: bool = False):
        """Single-view forward. Returns density map, plus the cls map when
        the variant has a classifier (parity: models.py:89-96,127-136,
        217-228, 261-273)."""
        y_cat, x3 = self.forward_fe(x, train=train)
        y_den = self._den_features(y_cat, train)
        if self.use_mem:
            y_den, _ = self.memory(y_den, need_logits=False)
        d = self.den_head(y_den, train=train)
        if self.use_cls:
            c = self.cls_head(x3, train=train)
            c_resized = (
                self.transform_cls_map_gt(c_gt)
                if c_gt is not None
                else self.transform_cls_map_pred(c)
            )
            dc = upsample(d * c_resized, 4)
            return dc, c
        return upsample(d, 4)

    # ---- two-view training forward ----------------------------------------

    def forward_train(self, img1, img2, c_gt=None):
        """Two-view consistency training (models.py:160-184, 298-335).

        Without cls (memadd): returns (d1, d2, loss_con).
        With cls (final): returns (dc1, dc2, c1, c2, c_err, loss_con, loss_err).
        """
        train = True
        if self.batched_two_view:
            both = jnp.concatenate([img1, img2], axis=0)
            y_cat_b, x3_b = self.forward_fe(both, train=train)
            y_den_b = self._den_features(y_cat_b, train)
            y_den1, y_den2 = jnp.split(y_den_b, 2, axis=0)
            x3_1, x3_2 = jnp.split(x3_b, 2, axis=0)
        else:
            y_cat1, x3_1 = self.forward_fe(img1, train=train)
            y_cat2, x3_2 = self.forward_fe(img2, train=train)
            y_den1 = self._den_features(y_cat1, train)
            y_den2 = self._den_features(y_cat2, train)

        y_in1 = instance_norm(y_den1.astype(jnp.float32))
        y_in2 = instance_norm(y_den2.astype(jnp.float32))
        e_mask = jax.lax.stop_gradient(
            (jnp.abs(y_in1 - y_in2) < self.err_thrs).astype(y_den1.dtype)
        )
        loss_err = (
            jnp.mean(jnp.abs(y_in1 - y_in2)) if self.has_err_loss else jnp.float32(0.0)
        )

        rng1 = self.make_rng("dropout")
        rng2 = self.make_rng("dropout")
        y_m1 = dropout2d(y_den1 * e_mask, self.den_dropout, rng1)
        y_m2 = dropout2d(y_den2 * e_mask, self.den_dropout, rng2)

        def consistency(l1, l2):
            if self.tp_axis is None:
                return jsd_as_mse(l1, l2)
            # TP: l1/l2 are LOCAL slices of the globally-normalized
            # attention probabilities — the full-bank MSE is the psum of
            # local squared differences over the true element count
            num = jax.lax.psum(jnp.sum((l1 - l2) ** 2), self.tp_axis)
            return num / (l1.shape[0] * l1.shape[1] * self.mem_size)

        if self.batched_two_view:
            # one batched attention + head (the memory bank and the 1x1
            # den head have no batch statistics — bit-equivalent)
            y_new_b, logits_b = self.memory(
                jnp.concatenate([y_m1, y_m2], axis=0))
            logits1, logits2 = jnp.split(logits_b, 2, axis=0)
            loss_con = consistency(logits1, logits2)
            d1, d2 = jnp.split(self.den_head(y_new_b, train=train), 2, axis=0)
        elif self.tp_axis is None:
            # paired two-view attention + consistency in one op — on
            # TPU the fused training kernel keeps both views' (B, P, S)
            # logits/probs out of HBM entirely (MemoryBank.pair)
            y_new1, y_new2, loss_con = self.memory.pair(y_m1, y_m2)
            d1 = self.den_head(y_new1, train=train)
            d2 = self.den_head(y_new2, train=train)
        else:
            y_new1, logits1 = self.memory(y_m1)
            y_new2, logits2 = self.memory(y_m2)
            loss_con = consistency(logits1, logits2)
            d1 = self.den_head(y_new1, train=train)
            d2 = self.den_head(y_new2, train=train)

        if not self.use_cls:
            return upsample(d1, 4), upsample(d2, 4), loss_con

        if self.batched_two_view:
            # cls_head has BN — union statistics under the knob
            c1, c2 = jnp.split(self.cls_head(x3_b, train=train), 2, axis=0)
        else:
            c1 = self.cls_head(x3_1, train=train)
            c2 = self.cls_head(x3_2, train=train)
        c_resized_gt = self.transform_cls_map_gt(c_gt)
        c_r1 = self.transform_cls_map_pred(c1)
        c_r2 = self.transform_cls_map_pred(c2)
        c_err = jnp.abs(c_r1 - c_r2)
        c_resized = jnp.clip(c_resized_gt + c_err, 0.0, 1.0)

        dc1 = upsample(d1 * c_resized, 4)
        dc2 = upsample(d2 * c_resized, 4)
        c_err = upsample(c_err, 4)
        return dc1, dc2, c1, c2, c_err, loss_con, loss_err


def _variant(name, **flags):
    def build(**params):
        kw = dict(flags)
        # accept the reference YAML param names verbatim (configs/*.yml)
        for k in ("mem_size", "mem_dim", "den_dropout", "cls_dropout",
                  "cls_thrs", "err_thrs", "has_err_loss", "pretrained",
                  "fused_mem", "fused_mem_train", "remat",
                  "batched_two_view", "tp_axis",
                  "vgg_cfg", "stage_splits", "dec_widths", "dtype"):
            if k in params:
                kw[k] = params[k]
        return DGModel(**kw)

    MODELS.register(name, build)
    return build


dg_base = _variant("base", use_mem=False, use_cls=False, den_dec_dropout=True)
dg_mem = _variant("mem", use_mem=True, use_cls=False, den_dec_dropout=True)
dg_memadd = _variant("memadd", use_mem=True, use_cls=False, den_dec_dropout=False)
dg_cls = _variant("cls", use_mem=False, use_cls=True, den_dec_dropout=True)
dg_memcls = _variant("memcls", use_mem=True, use_cls=True, den_dec_dropout=True)
dg_final = _variant("final", use_mem=True, use_cls=True, den_dec_dropout=False)
