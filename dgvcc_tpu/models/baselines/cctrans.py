"""CCTrans — Twins-ALTGVT pyramid vision transformer counter.

Reference models/baselines/CCTrans.py: 4-stage pyramid with alternating
window attention (LSA/GroupAttention, CCTrans.py:110-148) and global
sub-sampled attention (GSA/Attention with strided-conv kv reduction,
:151-196), PEG positional encoding (PosCNN depthwise conv after the
first block of each stage, :385-403), and a multi-scale Regression
head over stages 2-4 (x8/x16/x32 features fused at stride 8, dilated
conv pyramid, x1 output at stride 8, :12-86).

Notes:
  * the reference registers 'cctrans' as alt_gvt_base (main_base.py:47)
    whose embed dims (96/192/384/768) do NOT match the Regression
    head's hard-coded 256/512/1024 input channels — a latent crash.
    Flax convs infer input width, so both variants work here; the
    registered default is the alt_gvt_large geometry the head was
    written for.
  * window attention pads H, W up to window multiples and crops back,
    so arbitrary crop sizes work (the reference requires divisibility).
  * attention runs as batched MXU matmuls with f32 softmax accumulators.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import TorchBatchNorm


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class GroupAttention(nn.Module):
    """Window self-attention (LSA), window size ws."""

    num_heads: int
    ws: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.ws
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        hg, wg = hp // ws, wp // ws

        qkv = nn.Dense(c * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, hg, ws, wg, ws, 3, self.num_heads, c // self.num_heads)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7)  # 3,B,hg,wg,heads,ws,ws,hd
        qkv = qkv.reshape(3, b, hg * wg, self.num_heads, ws * ws, c // self.num_heads)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // self.num_heads) ** -0.5
        attn = jnp.einsum("bghqd,bghkd->bghqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        if ph or pw:
            # mask padded key tokens out of the border windows
            valid = jnp.ones((h, w), bool)
            valid = jnp.pad(valid, ((0, ph), (0, pw)))
            valid = valid.reshape(hg, ws, wg, ws).transpose(0, 2, 1, 3)
            valid = valid.reshape(1, hg * wg, 1, 1, ws * ws)
            attn = jnp.where(valid, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bghqk,bghkd->bghqd", attn, v)
        out = out.reshape(b, hg, wg, self.num_heads, ws, ws, c // self.num_heads)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class GlobalAttention(nn.Module):
    """Global sub-sampled attention (GSA): kv from sr-strided conv."""

    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=True, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="norm")(kv_in)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(c * 2, use_bias=True, dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, m, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * hd**-0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class GroupBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    ws: int  # 1 → global attention
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.ws == 1:
            y = GlobalAttention(self.num_heads, self.sr_ratio, dtype=self.dtype,
                                name="attn")(y)
        else:
            y = GroupAttention(self.num_heads, self.ws, dtype=self.dtype,
                               name="attn")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(y)
        return x + y


class PosCNN(nn.Module):
    """PEG: depthwise 3x3 conv + residual (CCTrans.py:385-403)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c,
                    use_bias=True, dtype=self.dtype, name="proj")(x)
        return y + x


class PatchEmbed(nn.Module):
    patch: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="proj")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class Regression(nn.Module):
    """Multi-scale FPN-ish head (CCTrans.py:12-86). Inputs: stage 2/3/4
    features at strides 8/16/32; output: 1-channel density at stride 8,
    then x8 bilinear to full res at the model level (configs feed
    downsample-8 gt in the reference; we return stride-8 like the
    reference forward does)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        def bn(name):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        def cbr(x, ch, k, dil, name):
            p = dil * (k // 2)
            x = nn.Conv(ch, (k, k), padding=[(p, p)] * 2,
                        kernel_dilation=(dil, dil), dtype=self.dtype,
                        name=name + "_conv")(x)
            return nn.relu(bn(name + "_bn")(x))

        hw = x1.shape[1:3]

        def to_hw(t):
            # nn.Upsample(..., align_corners=True) (CCTrans.py:24-34)
            from dgvcc_tpu.nn.layers import resize_bilinear_ac

            return resize_bilinear_ac(t, hw)

        v1 = cbr(x1, 256, 3, 1, "v1")
        v2 = cbr(to_hw(x2), 256, 3, 1, "v2")
        v3 = cbr(to_hw(x3), 256, 3, 1, "v3")
        x = v1 + v2 + v3
        y1 = cbr(x, 128, 3, 1, "stage1")
        y2 = cbr(x, 128, 3, 2, "stage2")
        y3 = cbr(x, 128, 3, 3, "stage3")
        y4 = cbr(x, 384, 1, 1, "stage4")
        y = jnp.concatenate([y1, y2, y3], axis=-1) + y4
        y = cbr(y, 64, 3, 1, "res1")
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="res2")(y)
        return nn.relu(y)


class ALTGVT(nn.Module):
    embed_dims: Sequence[int] = (128, 256, 512, 1024)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    depths: Sequence[int] = (2, 2, 18, 2)
    wss: Sequence[int] = (8, 8, 8, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    pretrained: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = []
        for k in range(len(self.depths)):
            patch = 4 if k == 0 else 2
            x = PatchEmbed(patch, self.embed_dims[k], dtype=self.dtype,
                           name=f"patch_embed{k}")(x)
            for i in range(self.depths[k]):
                ws = 1 if i % 2 == 1 else self.wss[k]
                x = GroupBlock(self.num_heads[k], self.mlp_ratios[k], ws,
                               self.sr_ratios[k], dtype=self.dtype,
                               name=f"block{k}_{i}")(x)
                if i == 0:
                    x = PosCNN(dtype=self.dtype, name=f"pos_block{k}")(x)
            outputs.append(x)
        d = Regression(dtype=self.dtype, name="regression")(
            outputs[1], outputs[2], outputs[3], train=train
        )
        return d


def _cctrans(**params):
    known = {"embed_dims", "num_heads", "mlp_ratios", "depths", "wss",
             "sr_ratios", "pretrained", "dtype"}
    return ALTGVT(**{k: v for k, v in params.items() if k in known})


MODELS.register("cctrans", _cctrans)
