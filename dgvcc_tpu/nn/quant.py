"""Int8 post-training-quantization (PTQ) serving path for the DG family.

TPU v5e executes int8 x int8 -> int32 convolutions at ~2x the bf16
MXU rate (measured on this chip: 367 TOP/s vs 172 TF/s for a 512-ch
3x3 conv — see BENCH_NOTES.md). This module exports the DGModel eval
forward (models/dg.py::DGModel.__call__, reference models.py:89-96,
217-228, 261-273) as a quantized serving graph:

  1. **BN folding** — every inference-mode BatchNorm is an affine map,
     so conv+BN collapses exactly into one conv with per-channel
     scaled weights and a bias (`fold_variables`). This is lossless.
  2. **Weight quantization** — per-output-channel symmetric int8
     (`absmax / 127` scales), the standard PTQ recipe for convs.
  3. **Activation calibration** — run the folded fp graph over a few
     calibration frames recording per-site input absmax
     (`calibrate`); serving quantizes each conv input with its static
     scale. Elementwise glue (pool / upsample / concat / sigmoid) and
     the tiny heads stay bf16; the memory bank reuses the fused Pallas
     attention kernel.

All requantize chains are elementwise and fuse into the conv epilogues
under XLA, so the int8 graph's extra ops cost bandwidth only where a
pool/upsample breaks the chain.

Accuracy: counting is a sum over the density map, which averages out
zero-mean rounding noise; the int8 path tracks the bf16 path to ~1%
on counts (tested in tests/test_quant.py, measured on the TPU in
BENCH_NOTES.md).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgvcc_tpu.nn.layers import upsample
from dgvcc_tpu.nn.vgg import VGG16_CFG, feature_layout

_DN = ("NHWC", "HWIO", "NHWC")

# VGG16-BN torchvision feature-index splits used by the DG encoder
# (models/dg.py setup; reference models.py:35-38)
_ENC_SPLITS = (("enc1", 0, 23), ("enc2", 23, 33), ("enc3", 33, 43))
_DEC_BLOCKS = ("dec3_0", "dec3_1", "dec2_0", "dec2_1", "dec1_0", "dec1_1")


def fold_bn(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Collapse conv -> BN(eval) into an equivalent conv.

    BN(y) = scale * (y - mean) / sqrt(var + eps) + bn_bias is affine in
    the conv output channel, so it folds into the kernel's output-channel
    axis and a bias. Exact (up to float rounding).
    """
    g = scale / np.sqrt(np.asarray(var, np.float64) + eps)
    g = np.asarray(g, np.float32)
    kernel = np.asarray(kernel, np.float32) * g  # (kh,kw,cin,cout) * (cout,)
    b0 = np.zeros(kernel.shape[-1], np.float32) if bias is None else np.asarray(bias, np.float32)
    bias = (b0 - np.asarray(mean, np.float32)) * g + np.asarray(bn_bias, np.float32)
    return kernel, bias


def quantize_weight(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: returns (w8, scale[cout])."""
    k = np.asarray(kernel, np.float32)
    absmax = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0)
    ws = np.maximum(absmax, 1e-12) / 127.0
    w8 = np.clip(np.rint(k / ws), -127, 127).astype(np.int8)
    return w8, ws.astype(np.float32)


def fold_variables(variables: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold every conv(+BN) site of a DG model into {name: kernel, bias}.

    Site names are '<module>/<conv>' paths of the flax param tree
    (enc1/conv0 ... dec3_0 ... den_dec, cls_conv1, plus the BN-free
    den_head / cls_conv2).
    """
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    folded: Dict[str, Dict[str, np.ndarray]] = {}

    # encoder: torchvision-indexed conv{i}/bn{i+1} pairs
    for enc, lo, hi in _ENC_SPLITS:
        if enc not in params:
            continue
        for kind, idx, _ in feature_layout(VGG16_CFG, True):
            if kind != "conv" or not (lo <= idx < hi):
                continue
            conv = params[enc][f"conv{idx}"]
            bn_p = params[enc][f"bn{idx + 1}"]
            bn_s = stats[enc][f"bn{idx + 1}"]
            k, b = fold_bn(conv["kernel"], conv.get("bias"),
                           bn_p["scale"], bn_p["bias"],
                           bn_s["mean"], bn_s["var"])
            folded[f"{enc}/conv{idx}"] = {"kernel": k, "bias": b}

    # ConvBlock sites: Conv_0 (+ BatchNorm_0)
    for name in (*_DEC_BLOCKS, "den_dec", "cls_conv1", "den_head", "cls_conv2"):
        if name not in params:
            continue
        conv = params[name]["Conv_0"]
        if "BatchNorm_0" in params[name]:
            bn_p, bn_s = params[name]["BatchNorm_0"], stats[name]["BatchNorm_0"]
            k, b = fold_bn(conv["kernel"], conv.get("bias"),
                           bn_p["scale"], bn_p["bias"],
                           bn_s["mean"], bn_s["var"])
        else:
            k = np.asarray(conv["kernel"], np.float32)
            b = np.asarray(conv.get("bias", np.zeros(k.shape[-1])), np.float32)
        folded[name] = {"kernel": k, "bias": b}
    return folded


# sites that stay fp (tiny 1x1 heads; quantizing them saves nothing)
_FP_SITES = frozenset({"den_head", "cls_conv2"})


class QuantizedDG:
    """Quantized serving graph for a DGModel (eval forward only).

    Build with :meth:`from_model`; call with NHWC frames (any float
    dtype) to get the same (density, cls) outputs as
    ``model.apply(variables, frames)`` in eval mode, within
    quantization tolerance.
    """

    def __init__(self, folded: Dict, scales: Dict[str, float], model,
                 mem: Optional[np.ndarray], dtype=jnp.bfloat16,
                 fused_mem: Optional[bool] = None):
        self.model = model
        self.dtype = dtype
        self.use_mem = model.use_mem
        self.use_cls = model.use_cls
        self.cls_thrs = model.cls_thrs
        if fused_mem is None:
            fused_mem = jax.default_backend() != "cpu"
        self.fused_mem = fused_mem
        self.scales = {k: float(v) for k, v in scales.items()}
        q: Dict[str, Dict[str, Any]] = {}
        for name, site in folded.items():
            if name in _FP_SITES or name not in self.scales:
                q[name] = {"kernel": jnp.asarray(site["kernel"], dtype),
                           "bias": jnp.asarray(site["bias"], jnp.float32)}
            else:
                w8, ws = quantize_weight(site["kernel"])
                q[name] = {"w8": jnp.asarray(w8),
                           "ws": jnp.asarray(ws),
                           "bias": jnp.asarray(site["bias"], jnp.float32)}
        self.qparams: Dict[str, Any] = {"sites": q}
        if mem is not None:
            self.qparams["mem"] = jnp.asarray(mem, dtype)
        self._jitted = jax.jit(self._forward)

    # -- construction ----------------------------------------------------

    @classmethod
    def from_model(cls, model, variables, calib_frames,
                   dtype=jnp.bfloat16, fused_mem: Optional[bool] = None
                   ) -> "QuantizedDG":
        """Fold, calibrate on ``calib_frames`` (NHWC), and quantize."""
        folded = fold_variables(variables)
        mem = (np.asarray(variables["params"]["memory"]["mem"])
               if model.use_mem else None)
        caps = calibrate(model, folded, mem, calib_frames)
        # floor like quantize_weight's: a ReLU-dead (all-zero) calib site
        # would otherwise get scale 0 → x/0 NaNs and an input-independent
        # conv output
        scales = {k: max(v, 1e-12) / 127.0 for k, v in caps.items()}
        return cls(folded, scales, model, mem, dtype=dtype,
                   fused_mem=fused_mem)

    # -- serving forward --------------------------------------------------

    def _qconv(self, qparams, x, name: str, relu: bool = True,
               padding="SAME"):
        site = qparams["sites"][name]
        if "w8" not in site:  # fp site
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), site["kernel"], (1, 1), padding,
                dimension_numbers=_DN)
            y = y + site["bias"].astype(self.dtype)
            return jax.nn.relu(y) if relu else y
        s = self.scales[name]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                      ).astype(jnp.int8)
        yi = jax.lax.conv_general_dilated(
            xq, site["w8"], (1, 1), padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = yi.astype(jnp.float32) * (site["ws"] * s) + site["bias"]
        if relu:
            y = jax.nn.relu(y)
        return y.astype(self.dtype)

    def _encoder(self, qparams, x):
        feats = []
        for enc, lo, hi in _ENC_SPLITS:
            for kind, idx, _ in feature_layout(VGG16_CFG, True):
                if not (lo <= idx < hi):
                    continue
                if kind == "conv":
                    x = self._qconv(qparams, x, f"{enc}/conv{idx}")
                elif kind == "pool":
                    x = jax.lax.reduce_window(
                        x, -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128),
                        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            feats.append(x)
        return feats  # [x1 (s4), x2 (s8), x3 (s16)]

    def _forward(self, qparams, frames):
        """Mirrors DGModel.__call__ eval path (models/dg.py forward_fe +
        heads); parity: reference models.py:64-96, 217-228."""
        x = frames.astype(self.dtype)
        x1, x2, x3 = self._encoder(qparams, x)

        y = self._qconv(qparams, x3, "dec3_0")
        y = self._qconv(qparams, y, "dec3_1")
        y3 = y
        y = upsample(y, 2)
        y = jnp.concatenate([y, x2], axis=-1)
        y = self._qconv(qparams, y, "dec2_0")
        y = self._qconv(qparams, y, "dec2_1")
        y2 = y
        y = upsample(y, 2)
        y = jnp.concatenate([y, x1], axis=-1)
        y = self._qconv(qparams, y, "dec1_0")
        y = self._qconv(qparams, y, "dec1_1")
        y1 = y

        y_cat = jnp.concatenate([y1, upsample(y2, 2), upsample(y3, 4)], axis=-1)
        y_den = self._qconv(qparams, y_cat, "den_dec")
        if self.use_mem:
            mem = qparams["mem"]
            b, h, w, k = y_den.shape
            y_flat = y_den.reshape(b, h * w, k)
            if self.fused_mem:
                from dgvcc_tpu.ops.mem_attention import memory_attention_fused
                y_flat = memory_attention_fused(y_flat, mem)
            else:
                logits = jnp.einsum("bpk,ks->bps", y_flat, mem,
                                    preferred_element_type=jnp.float32
                                    ) / math.sqrt(k)
                attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                y_flat = jnp.einsum("bps,sk->bpk", attn, mem.T,
                                    preferred_element_type=jnp.float32
                                    ).astype(self.dtype)
            y_den = y_flat.reshape(b, h, w, k)
        d = self._qconv(qparams, y_den, "den_head")
        if not self.use_cls:
            return upsample(d, 4), None
        c = self._qconv(qparams, x3, "cls_conv1")
        c = jax.nn.sigmoid(self._qconv(qparams, c, "cls_conv2", relu=False))
        c_bin = jnp.where(c >= self.cls_thrs, 1.0, 0.0).astype(d.dtype)
        dc = upsample(d * upsample(c_bin, 4, mode="nearest"), 4)
        return dc, c

    def __call__(self, frames):
        return self._jitted(self.qparams, frames)


def calibrate(model, folded: Dict, mem: Optional[np.ndarray],
              calib_frames) -> Dict[str, float]:
    """Per-site input absmax over calibration frames, via the folded fp
    graph (identical activations to the BN graph, so calibrating on the
    folded graph is exact)."""
    q = QuantizedDG(folded, scales={}, model=model, mem=mem,
                    dtype=jnp.float32, fused_mem=False)
    orig = q._qconv

    @jax.jit
    def run(frames):
        caps: Dict[str, Any] = {}

        def capturing(qp, x, name, relu=True, padding="SAME"):
            if name not in _FP_SITES:
                m = jnp.max(jnp.abs(x.astype(jnp.float32)))
                caps[name] = jnp.maximum(caps[name], m) if name in caps else m
            return orig(qp, x, name, relu=relu, padding=padding)

        q._qconv = capturing
        try:
            q._forward(q.qparams, frames)
        finally:
            q._qconv = orig
        return caps

    return {k: float(v) for k, v in
            jax.device_get(run(jnp.asarray(calib_frames))).items()}


def fp_folded_forward(model, variables, frames, dtype=jnp.float32):
    """The folded fp graph (no quantization) — exactness harness."""
    folded = fold_variables(variables)
    mem = (np.asarray(variables["params"]["memory"]["mem"])
           if model.use_mem else None)
    q = QuantizedDG(folded, scales={}, model=model, mem=mem, dtype=dtype,
                    fused_mem=False)
    return q._forward(q.qparams, jnp.asarray(frames))
