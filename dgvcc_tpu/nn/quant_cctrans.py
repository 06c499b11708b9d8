"""Int8 PTQ recipe for CCTrans (Twins-ALTGVT) — the attention family.

Reference models/baselines/CCTrans.py:219-534. Where the conv(+BN)
baselines quantize 3x3 conv stacks, a pyramid vision transformer's
FLOPs live in its Dense layers — qkv/proj projections and the 4x MLPs.
Every Dense here acts on an NHWC tensor, so each one IS a 1x1
convolution: the whole model lowers onto QuantizedConvNet's existing
``qconv`` primitive (nn/quant.py) with int8 weights + per-tensor
activation scales, and the TPU MXU runs them as int8 matmuls.

What stays fp (the glue that doesn't touch the MXU):
  * LayerNorms — parameters ride the ``__extras__`` channel, stats in
    f32 (memory-bound; int8 would destroy the residual stream).
  * attention logits/softmax einsums — f32 accumulators, bf16 tensors;
    these consume qkv OUTPUTS, so per-tensor requantizing between them
    would add traffic without an MXU win at window sizes (ws²=64 keys).
  * PEG depthwise convs (cin=1 per group — min_ch keeps them fp) and
    the thin regression tail (res1/res2).

The Regression head's conv+BN stack folds exactly like the classic
baselines (`_fold_site`). Site naming: pe{k} patch embeds,
b{k}_{i}_{qkv|q|kv|sr|proj|fc1|fc2} blocks, pos{k} PEG,
reg_{v1..res2} head.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _dense_site(dense) -> Dict[str, np.ndarray]:
    """A Dense on NHWC is a 1x1 conv: (Cin, Cout) → (1, 1, Cin, Cout)."""
    k = np.asarray(dense["kernel"], np.float32)
    b = np.asarray(dense.get("bias", np.zeros(k.shape[-1])), np.float32)
    return {"kernel": k[None, None], "bias": b}


def _ln_params(ln) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(ln["scale"], np.float32),
            "bias": np.asarray(ln["bias"], np.float32)}


def cctrans_fold(variables, model) -> Dict:
    from dgvcc_tpu.nn.quant import _fold_site, _plain_conv_site

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    folded: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}
    for k in range(len(model.depths)):
        pe = params[f"patch_embed{k}"]
        folded[f"pe{k}"] = _plain_conv_site(pe["proj"])
        extras[f"pe{k}_norm"] = _ln_params(pe["norm"])
        for i in range(model.depths[k]):
            blk = params[f"block{k}_{i}"]
            pre = f"b{k}_{i}"
            extras[f"{pre}_norm1"] = _ln_params(blk["norm1"])
            extras[f"{pre}_norm2"] = _ln_params(blk["norm2"])
            attn = blk["attn"]
            for dn in ("qkv", "q", "kv", "proj"):
                if dn in attn:
                    folded[f"{pre}_{dn}"] = _dense_site(attn[dn])
            if "sr" in attn:
                folded[f"{pre}_sr"] = _plain_conv_site(attn["sr"])
                extras[f"{pre}_srnorm"] = _ln_params(attn["norm"])
            folded[f"{pre}_fc1"] = _dense_site(blk["mlp"]["fc1"])
            folded[f"{pre}_fc2"] = _dense_site(blk["mlp"]["fc2"])
        folded[f"pos{k}"] = _plain_conv_site(params[f"pos_block{k}"]["proj"])
    reg = params["regression"]
    reg_s = stats["regression"]
    for nm in ("v1", "v2", "v3", "stage1", "stage2", "stage3", "stage4",
               "res1"):
        folded[f"reg_{nm}"] = _fold_site(reg[f"{nm}_conv"], reg[f"{nm}_bn"],
                                         reg_s[f"{nm}_bn"])
    folded["reg_res2"] = _plain_conv_site(reg["res2"])
    folded["__extras__"] = extras
    return folded


def _ln(x, prm, eps=1e-6):
    """flax LayerNorm eval math (use_fast_variance: E[x²]−E[x]²)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * prm["scale"] + prm["bias"]).astype(x.dtype)


def _group_attn(qconv, x, pre, heads, ws):
    """LSA window attention — mirrors models/baselines/cctrans.py
    GroupAttention (reference CCTrans.py:110-148)."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    hg, wg = hp // ws, wp // ws
    hd = c // heads

    qkv = qconv(x, f"{pre}_qkv", relu=False)
    qkv = qkv.reshape(b, hg, ws, wg, ws, 3, heads, hd)
    qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7)
    qkv = qkv.reshape(3, b, hg * wg, heads, ws * ws, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bghqd,bghkd->bghqk", q, k,
                      preferred_element_type=jnp.float32) * hd**-0.5
    if ph or pw:
        valid = jnp.ones((h, w), bool)
        valid = jnp.pad(valid, ((0, ph), (0, pw)))
        valid = valid.reshape(hg, ws, wg, ws).transpose(0, 2, 1, 3)
        valid = valid.reshape(1, hg * wg, 1, 1, ws * ws)
        attn = jnp.where(valid, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bghqk,bghkd->bghqd", attn, v)
    out = out.reshape(b, hg, wg, heads, ws, ws, hd)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
    return qconv(out[:, :h, :w], f"{pre}_proj", relu=False)


def _global_attn(qconv, x, extras, pre, heads, sr):
    """GSA with strided-conv kv reduction (reference CCTrans.py:151-196)."""
    b, h, w, c = x.shape
    hd = c // heads
    q = qconv(x, f"{pre}_q", relu=False)
    q = q.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)
    kv_in = x
    if sr > 1:
        kv_in = qconv(x, f"{pre}_sr", relu=False, strides=(sr, sr))
        kv_in = _ln(kv_in, extras[f"{pre}_srnorm"])
    m = kv_in.shape[1] * kv_in.shape[2]
    kv = qconv(kv_in, f"{pre}_kv", relu=False)
    kv = kv.reshape(b, m, 2, heads, hd).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * hd**-0.5
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return qconv(out, f"{pre}_proj", relu=False)


def cctrans_forward(qconv, x, extras, depths, heads, wss, sr_ratios):
    """Eval graph of models/baselines/cctrans.py::ALTGVT against the
    qconv primitive; fp-exactness vs model.apply is tested with empty
    scales (tests/test_quant.py), int8 within count tolerance."""
    from dgvcc_tpu.nn.layers import resize_bilinear_ac

    outputs = []
    for k in range(len(depths)):
        patch = 4 if k == 0 else 2
        x = qconv(x, f"pe{k}", relu=False, strides=(patch, patch))
        x = _ln(x, extras[f"pe{k}_norm"])
        for i in range(depths[k]):
            pre = f"b{k}_{i}"
            ws = 1 if i % 2 == 1 else wss[k]
            y = _ln(x, extras[f"{pre}_norm1"])
            if ws == 1:
                y = _global_attn(qconv, y, extras, pre, heads[k],
                                 sr_ratios[k])
            else:
                y = _group_attn(qconv, y, pre, heads[k], ws)
            x = x + y
            y = _ln(x, extras[f"{pre}_norm2"])
            y = qconv(y, f"{pre}_fc1", relu=False)
            y = jax.nn.gelu(y, approximate=False)
            y = qconv(y, f"{pre}_fc2", relu=False)
            x = x + y
            if i == 0:  # PEG after the first block of each stage
                c = x.shape[-1]
                x = x + qconv(x, f"pos{k}", relu=False,
                              padding=((1, 1), (1, 1)), groups=c)
        outputs.append(x)

    x1, x2, x3 = outputs[1], outputs[2], outputs[3]
    hw = x1.shape[1:3]

    def cbr(t, nm, k, dil):
        p = dil * (k // 2)
        return qconv(t, f"reg_{nm}", relu=True, padding=((p, p), (p, p)),
                     dilation=(dil, dil))

    v1 = cbr(x1, "v1", 3, 1)
    v2 = cbr(resize_bilinear_ac(x2, hw), "v2", 3, 1)
    v3 = cbr(resize_bilinear_ac(x3, hw), "v3", 3, 1)
    x = v1 + v2 + v3
    y1 = cbr(x, "stage1", 3, 1)
    y2 = cbr(x, "stage2", 3, 2)
    y3 = cbr(x, "stage3", 3, 3)
    y4 = cbr(x, "stage4", 1, 1)
    y = jnp.concatenate([y1, y2, y3], axis=-1) + y4
    y = cbr(y, "res1", 3, 1)
    return qconv(y, "reg_res2", relu=True)
