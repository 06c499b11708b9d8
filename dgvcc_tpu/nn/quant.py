"""Int8 post-training-quantization (PTQ) serving paths.

Covers the DG family (:class:`QuantizedDG`, the original hand-tuned
graph) and, generically, every feed-forward conv(+BN) baseline —
CSRNet / MCNN / BL-VGG / SASNet — via :class:`QuantizedConvNet` with a
small fold/forward spec per family and selective (min-channel) site
quantization. Entry point: :func:`build_quantized`.

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


def _dg_geometry(model):
    """(cfg, enc_splits) of a DGModel — honors the vgg_cfg/stage_splits
    overrides (tiny test geometry, models/dg.py:163-164); defaults to
    the production VGG16-BN plan."""
    cfg = tuple(VGG16_CFG if getattr(model, "vgg_cfg", None) is None
                else model.vgg_cfg)
    s0, s1, s2, s3 = getattr(model, "stage_splits", (0, 23, 33, 43))
    return cfg, (("enc1", s0, s1), ("enc2", s1, s2), ("enc3", s2, s3))


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


def _cast_sites(sites: Dict, dtype) -> Dict[str, Dict[str, Any]]:
    """Device-place saved site dicts: int8 weights + f32 scales/biases
    stay as stored, fp-site kernels (stored f32 in the artifact for
    msgpack portability) cast back to the serving dtype. Shared by both
    quantized-graph classes' :meth:`from_sites` (nn/quant_io.py)."""
    out: Dict[str, Dict[str, Any]] = {}
    for name, site in sites.items():
        if "w8" in site:
            out[name] = {"w8": jnp.asarray(site["w8"], jnp.int8),
                         "ws": jnp.asarray(site["ws"], jnp.float32),
                         "bias": jnp.asarray(site["bias"], jnp.float32)}
        else:
            out[name] = {"kernel": jnp.asarray(site["kernel"], dtype),
                         "bias": jnp.asarray(site["bias"], jnp.float32)}
    return out


def fold_variables(variables: Dict, model=None
                   ) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold every conv(+BN) site of a DG model into {name: kernel, bias}.

    Site names are '<module>/<conv>' paths of the flax param tree
    (enc1/conv0 ... dec3_0 ... den_dec, cls_conv1, plus the BN-free
    den_head / cls_conv2). ``model`` supplies the encoder geometry when
    it overrides the default VGG16 plan.
    """
    cfg, enc_splits = _dg_geometry(model) if model is not None \
        else (VGG16_CFG, _ENC_SPLITS)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    folded: Dict[str, Dict[str, np.ndarray]] = {}

    # encoder: torchvision-indexed conv{i}/bn{i+1} pairs
    for enc, lo, hi in enc_splits:
        if enc not in params:
            continue
        for kind, idx, _ in feature_layout(cfg, True):
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
                 fused_mem: Optional[bool] = None,
                 weight_only: bool = False):
        self.model = model
        self.dtype = dtype
        self.use_mem = model.use_mem
        self.use_cls = model.use_cls
        self.cls_thrs = model.cls_thrs
        if fused_mem is None:
            fused_mem = jax.default_backend() != "cpu"
        self.fused_mem = fused_mem
        # weight_only: int8 weights in HBM, dequantized to the serving
        # dtype at use; activations stay bf16 and the conv runs on the
        # bf16 MXU. No activation quantize/requantize chains — a
        # memory-footprint/bandwidth variant for small-dispatch regimes
        # where full int8 loses (measured: B=1 768x1024 full-int8 runs
        # 2.2x SLOWER than bf16, BENCH_NOTES round 4/5). Needs no
        # activation calibration.
        self.weight_only = weight_only
        self.scales = {k: float(v) for k, v in scales.items()}
        q: Dict[str, Dict[str, Any]] = {}
        for name, site in folded.items():
            quantize_site = (name not in _FP_SITES
                             and (weight_only or name in self.scales))
            if not quantize_site:
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
                   dtype=jnp.bfloat16, fused_mem: Optional[bool] = None,
                   weight_only: bool = False) -> "QuantizedDG":
        """Fold, calibrate on ``calib_frames`` (NHWC), and quantize.
        ``weight_only=True`` skips activation calibration entirely
        (``calib_frames`` may be None): weights store int8, activations
        stay bf16."""
        folded = fold_variables(variables, model)
        mem = (np.asarray(variables["params"]["memory"]["mem"])
               if model.use_mem else None)
        if weight_only:
            return cls(folded, {}, model, mem, dtype=dtype,
                       fused_mem=fused_mem, weight_only=True)
        caps = calibrate(model, folded, mem, calib_frames)
        # floor like quantize_weight's: a ReLU-dead (all-zero) calib site
        # would otherwise get scale 0 → x/0 NaNs and an input-independent
        # conv output
        scales = {k: max(v, 1e-12) / 127.0 for k, v in caps.items()}
        return cls(folded, scales, model, mem, dtype=dtype,
                   fused_mem=fused_mem)

    @classmethod
    def from_sites(cls, sites: Dict, scales: Dict[str, float], model,
                   mem: Optional[np.ndarray] = None, dtype=jnp.bfloat16,
                   fused_mem: Optional[bool] = None) -> "QuantizedDG":
        """Rebuild from already-quantized sites (a saved int8 artifact,
        nn/quant_io.py) — no folding, no calibration, no fp forwards."""
        self = cls.__new__(cls)
        self.model = model
        self.dtype = dtype
        self.use_mem = model.use_mem
        self.use_cls = model.use_cls
        self.cls_thrs = model.cls_thrs
        if fused_mem is None:
            fused_mem = jax.default_backend() != "cpu"
        self.fused_mem = fused_mem
        self.weight_only = False  # artifacts store full-int8 graphs
        self.scales = {k: float(v) for k, v in scales.items()}
        self.qparams = {"sites": _cast_sites(sites, dtype)}
        if mem is not None:
            self.qparams["mem"] = jnp.asarray(mem, dtype)
        self._jitted = jax.jit(self._forward)
        return self

    # -- serving forward --------------------------------------------------

    def _qconv(self, qparams, x, name: str, relu: bool = True,
               padding="SAME"):
        """``x`` may be a list/tuple of concat parts: the quantize is
        pushed INSIDE the concat (per-tensor scale commutes with
        concatenation, bit-identical xq) so each part quantizes to int8
        first and the wide bf16 concat — 88 MB/frame at den_dec for a
        768x1024 input — is never materialized; XLA fuses each part's
        (upsample+)round straight into the int8 concat write. fp sites
        (and calibration, scales not built yet) just concat."""
        site = qparams["sites"][name]
        parts = x if isinstance(x, (list, tuple)) else None
        if "w8" not in site or self.weight_only:  # fp-activation site
            if parts is not None:
                x = jnp.concatenate(parts, axis=-1)
            if "w8" in site:
                # weight-only: dequantize the int8 kernel at use (XLA
                # hoists this out of any scan — it is input-invariant);
                # the conv itself runs on the bf16 MXU with no
                # activation requantize chain
                kernel = (site["w8"].astype(self.dtype)
                          * site["ws"].astype(self.dtype))
            else:
                kernel = site["kernel"]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, (1, 1), padding,
                dimension_numbers=_DN)
            y = y + site["bias"].astype(self.dtype)
            return jax.nn.relu(y) if relu else y
        s = self.scales[name]

        def q8(t):
            return jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127
                            ).astype(jnp.int8)

        xq = (jnp.concatenate([q8(p) for p in parts], axis=-1)
              if parts is not None else q8(x))
        yi = jax.lax.conv_general_dilated(
            xq, site["w8"], (1, 1), padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = yi.astype(jnp.float32) * (site["ws"] * s) + site["bias"]
        if relu:
            y = jax.nn.relu(y)
        return y.astype(self.dtype)

    def _encoder(self, qparams, x):
        feats = []
        cfg, enc_splits = _dg_geometry(self.model)
        for enc, lo, hi in enc_splits:
            for kind, idx, _ in feature_layout(cfg, True):
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
        y = self._qconv(qparams, [upsample(y, 2), x2], "dec2_0")
        y = self._qconv(qparams, y, "dec2_1")
        y2 = y
        y = self._qconv(qparams, [upsample(y, 2), x1], "dec1_0")
        y = self._qconv(qparams, y, "dec1_1")
        y1 = y

        y_den = self._qconv(
            qparams, [y1, upsample(y2, 2), upsample(y3, 4)], "den_dec")
        if self.use_mem:
            mem = qparams["mem"]
            b, h, w, k = y_den.shape
            y_flat = y_den.reshape(b, h * w, k)
            # batch-conditional like MemoryBank, but the INT8 graph's
            # crossover sits higher: at B=4 the custom call costs the
            # surrounding requantize chains more than it saves (9.46
            # fused vs 6.84 einsum ms/frame at 768x1024; fused wins
            # from B=8: 5.65 vs 6.76 — BENCH_NOTES round 5)
            if self.fused_mem and b >= 8:
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
                # concat sites pass parts: absmax over the parts equals
                # the absmax of their concatenation
                ps = x if isinstance(x, (list, tuple)) else (x,)
                m = jnp.max(jnp.asarray(
                    [jnp.max(jnp.abs(p.astype(jnp.float32))) for p in ps]))
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
    folded = fold_variables(variables, model)
    mem = (np.asarray(variables["params"]["memory"]["mem"])
           if model.use_mem else None)
    q = QuantizedDG(folded, scales={}, model=model, mem=mem, dtype=dtype,
                    fused_mem=False)
    return q._forward(q.qparams, jnp.asarray(frames))


# ---------------------------------------------------------------------------
# Generic conv(+BN) serving graphs: CSRNet / MCNN / BL-VGG / SASNet
# ---------------------------------------------------------------------------

def _maxpool(x):
    init = -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128)
    return jax.lax.reduce_window(x, init, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


class QuantizedConvNet:
    """Generic int8 PTQ serving graph for feed-forward conv(+BN) models.

    A family is two functions:
      * ``fold(variables) -> {site: {kernel, bias}}`` — walk the param
        tree, folding every eval-mode BN into its conv (`fold_bn`);
      * ``forward(qconv, frames) -> density`` — the eval graph written
        against a ``qconv(x, site, relu=True, padding="SAME",
        dilation=(1, 1))`` primitive plus jnp glue (pool/resize/concat).

    The same forward serves three roles: fp folded-graph exactness
    checks (empty ``scales``), activation calibration (wrapped qconv),
    and the int8 serving path — so the graph cannot drift between them.
    """

    def __init__(self, folded: Dict, scales: Dict[str, float], forward_fn,
                 fp_sites=frozenset(), dtype=jnp.bfloat16):
        self.dtype = dtype
        self.forward_fn = forward_fn
        self.fp_sites = frozenset(fp_sites)
        self.scales = {k: float(v) for k, v in scales.items()}
        q: Dict[str, Dict[str, Any]] = {}
        for name, site in folded.items():
            if name == "__extras__":
                continue
            if name in self.fp_sites or name not in self.scales:
                q[name] = {"kernel": jnp.asarray(site["kernel"], dtype),
                           "bias": jnp.asarray(site["bias"], jnp.float32)}
            else:
                w8, ws = quantize_weight(site["kernel"])
                q[name] = {"w8": jnp.asarray(w8), "ws": jnp.asarray(ws),
                           "bias": jnp.asarray(site["bias"], jnp.float32)}
        self.qparams: Dict[str, Any] = {"sites": q}
        if "__extras__" in folded:
            # non-conv learned glue the forward needs in fp (e.g.
            # DSSINet's PReLU slopes) — fold_fn stashes them under
            # '__extras__' and forward_fn takes a third argument
            self.qparams["extras"] = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32), folded["__extras__"])
        self._jitted = jax.jit(self._forward)

    @classmethod
    def from_sites(cls, sites: Dict, scales: Dict[str, float], forward_fn,
                   fp_sites=frozenset(), extras=None,
                   dtype=jnp.bfloat16) -> "QuantizedConvNet":
        """Rebuild from already-quantized sites (a saved int8 artifact,
        nn/quant_io.py) — no folding, no calibration, no fp forwards."""
        self = cls.__new__(cls)
        self.dtype = dtype
        self.forward_fn = forward_fn
        self.fp_sites = frozenset(fp_sites)
        self.scales = {k: float(v) for k, v in scales.items()}
        self.qparams = {"sites": _cast_sites(sites, dtype)}
        if extras is not None:
            self.qparams["extras"] = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32), extras)
        self._jitted = jax.jit(self._forward)
        return self

    def _qconv(self, qparams, x, name: str, relu: bool = True,
               padding="SAME", dilation=(1, 1), strides=(1, 1), groups=1):
        """``x`` may be a list/tuple of concat parts: for int8 sites each
        part quantizes BEFORE the channel concat (a per-tensor scale
        commutes with concatenation — bit-identical xq) so the wide
        higher-precision concat never materializes; fp sites just
        concat. Dense layers on NHWC tensors are (1,1) convs through the
        same primitive (quant_cctrans.py); ``strides``/``groups`` cover
        patch embeddings and depthwise PEG convs."""
        site = qparams["sites"][name]
        parts = x if isinstance(x, (list, tuple)) else None
        if "w8" not in site:  # fp site
            if parts is not None:
                x = jnp.concatenate(parts, axis=-1)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), site["kernel"], strides, padding,
                rhs_dilation=dilation, dimension_numbers=_DN,
                feature_group_count=groups)
            y = y + site["bias"].astype(self.dtype)
            return jax.nn.relu(y) if relu else y
        s = self.scales[name]

        def q8(t):
            return jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127
                            ).astype(jnp.int8)

        xq = (jnp.concatenate([q8(p) for p in parts], axis=-1)
              if parts is not None else q8(x))
        yi = jax.lax.conv_general_dilated(
            xq, site["w8"], strides, padding, rhs_dilation=dilation,
            dimension_numbers=_DN, feature_group_count=groups,
            preferred_element_type=jnp.int32)
        y = yi.astype(jnp.float32) * (site["ws"] * s) + site["bias"]
        if relu:
            y = jax.nn.relu(y)
        return y.astype(self.dtype)

    def _forward(self, qparams, frames):
        def qconv(x, name, **kw):
            return self._qconv(qparams, x, name, **kw)

        x = frames.astype(self.dtype)
        if "extras" in qparams:
            return self.forward_fn(qconv, x, qparams["extras"])
        return self.forward_fn(qconv, x)

    def __call__(self, frames):
        return self._jitted(self.qparams, frames)


def calibrate_graph(folded: Dict, forward_fn, fp_sites,
                    calib_frames) -> Dict[str, float]:
    """Per-site input absmax over calibration frames via the fp folded
    graph (identical activations to the BN graph — folding is exact)."""
    q = QuantizedConvNet(folded, {}, forward_fn, fp_sites,
                         dtype=jnp.float32)
    orig = q._qconv

    @jax.jit
    def run(frames):
        caps: Dict[str, Any] = {}

        def capturing(qp, x, name, relu=True, **kw):
            if name not in q.fp_sites:
                ps = x if isinstance(x, (list, tuple)) else (x,)
                m = jnp.max(jnp.asarray(
                    [jnp.max(jnp.abs(p.astype(jnp.float32))) for p in ps]))
                caps[name] = jnp.maximum(caps[name], m) if name in caps else m
            return orig(qp, x, name, relu=relu, **kw)

        q._qconv = capturing
        try:
            q._forward(q.qparams, frames)
        finally:
            q._qconv = orig
        return caps

    return {k: float(v) for k, v in
            jax.device_get(run(jnp.asarray(calib_frames))).items()}


def _plain_conv_site(conv) -> Dict[str, np.ndarray]:
    k = np.asarray(conv["kernel"], np.float32)
    b = np.asarray(conv.get("bias", np.zeros(k.shape[-1])), np.float32)
    return {"kernel": k, "bias": b}


def _fold_site(conv, bn_p, bn_s, eps=1e-5) -> Dict[str, np.ndarray]:
    k, b = fold_bn(conv["kernel"], conv.get("bias"), bn_p["scale"],
                   bn_p["bias"], bn_s["mean"], bn_s["var"], eps=eps)
    return {"kernel": k, "bias": b}


# -- CSRNet (baselines/CSRNet.py:10-44; BN-free vgg16 front + dilated back)

def csrnet_fold(variables) -> Dict:
    params = jax.tree.map(np.asarray, variables["params"])
    folded = {}
    for stack in ("frontend", "backend"):
        for cname, conv in params[stack].items():
            folded[f"{stack}/{cname}"] = _plain_conv_site(conv)
    folded["output_layer"] = _plain_conv_site(params["output_layer"])
    return folded


def csrnet_forward(qconv, x):
    from dgvcc_tpu.models.baselines.csrnet import BACKEND, FRONTEND

    i = 0
    for v in FRONTEND:
        if v == "M":
            x = _maxpool(x)
        else:
            x = qconv(x, f"frontend/conv{i}")
            i += 1
    for i in range(len(BACKEND)):
        x = qconv(x, f"backend/conv{i}", dilation=(2, 2))
    return qconv(x, "output_layer", relu=False)


# -- MCNN (baselines/MCNN.py:7-75; 3 columns, pools after convs 0-1)

_MCNN_BRANCHES = (("branch1", 4), ("branch2", 4), ("branch3", 4))


def mcnn_fold(variables) -> Dict:
    params = jax.tree.map(np.asarray, variables["params"])
    folded = {}
    for bname, n in _MCNN_BRANCHES:
        for i in range(n):
            folded[f"{bname}/conv{i}"] = _plain_conv_site(
                params[bname][f"conv{i}"])
    folded["fuse"] = _plain_conv_site(params["fuse"])
    return folded


def mcnn_forward(qconv, x):
    outs = []
    for bname, n in _MCNN_BRANCHES:
        y = x
        for i in range(n):
            y = qconv(y, f"{bname}/conv{i}")
            if i < 2:
                y = _maxpool(y)
        outs.append(y)
    return qconv(list(outs), "fuse", relu=False)


# -- BL-VGG (baselines/BL.py:11-56; vgg19 features + x2 up + reg head)

def bl_fold(variables, batch_norm: bool = False) -> Dict:
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    folded = {}
    for kind, idx, _ in feature_layout(tuple(VGG19_CFG[:-1]), batch_norm):
        if kind != "conv":
            continue
        conv = params["features"][f"conv{idx}"]
        if batch_norm:
            folded[f"features/conv{idx}"] = _fold_site(
                conv, params["features"][f"bn{idx + 1}"],
                stats["features"][f"bn{idx + 1}"])
        else:
            folded[f"features/conv{idx}"] = _plain_conv_site(conv)
    for name in ("reg1", "reg2", "reg3"):
        folded[name] = _plain_conv_site(params[name])
    return folded


def bl_forward(qconv, x, batch_norm: bool = False):
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    for kind, idx, _ in feature_layout(tuple(VGG19_CFG[:-1]), batch_norm):
        if kind == "conv":
            x = qconv(x, f"features/conv{idx}")
        elif kind == "pool":
            x = _maxpool(x)
    x = upsample(x, 2, align_corners=True)  # F.upsample_bilinear, BL.py:25
    x = qconv(x, "reg1")
    x = qconv(x, "reg2")
    return jnp.abs(qconv(x, "reg3", relu=False))


# -- SASNet (baselines/SASNet.py:47-214; vgg16_bn U-decoder + heads)

_SAS_SPLITS = (("features1", 0, 6), ("features2", 6, 13),
               ("features3", 13, 23), ("features4", 23, 33),
               ("features5", 33, 43))


def sasnet_fold(variables) -> Dict:
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    folded = {}
    for st, lo, hi in _SAS_SPLITS:
        for kind, idx, _ in feature_layout(VGG16_CFG, True):
            if kind != "conv" or not (lo <= idx < hi):
                continue
            folded[f"{st}/conv{idx}"] = _fold_site(
                params[st][f"conv{idx}"], params[st][f"bn{idx + 1}"],
                stats[st][f"bn{idx + 1}"])
    for i in range(10):  # de_pred chains
        folded[f"ConvRelu_{i}"] = _plain_conv_site(
            params[f"ConvRelu_{i}"]["Conv_0"])
    for i in range(5):
        mb = params[f"MultiBranch_{i}"]
        mb_s = stats[f"MultiBranch_{i}"]
        for b in range(6):
            # BasicConv BN uses eps=1e-3 (SASNet.py:250, our sasnet.py)
            folded[f"MultiBranch_{i}/BasicConv_{b}"] = _fold_site(
                mb[f"BasicConv_{b}"]["Conv_0"],
                mb[f"BasicConv_{b}"]["BatchNorm_0"],
                mb_s[f"BasicConv_{b}"]["BatchNorm_0"], eps=1e-3)
        folded[f"Conv_{i}"] = _plain_conv_site(params[f"Conv_{i}"])
    for i in range(10, 20):  # confidence chains (tiny; fp)
        folded[f"ConvRelu_{i}"] = _plain_conv_site(
            params[f"ConvRelu_{i}"]["Conv_0"])
    return folded


def sasnet_forward(qconv, x, block_size: int = 32):
    """Mirror of models/baselines/sasnet.py __call__ (eval), itself
    parity-tested against reference SASNet.py:138-214."""
    from dgvcc_tpu.models.baselines.sasnet import (
        _adaptive_avg_pool, _resize_bilinear, _resize_nearest)

    size_hw = x.shape[1:3]
    feats = []
    for st, lo, hi in _SAS_SPLITS:
        for kind, idx, _ in feature_layout(VGG16_CFG, True):
            if not (lo <= idx < hi):
                continue
            if kind == "conv":
                x = qconv(x, f"{st}/conv{idx}")
            elif kind == "pool":
                x = _maxpool(x)
        feats.append(x)
    x1, x2, x3, x4, x5 = feats

    y = qconv(x5, "ConvRelu_0")
    y = qconv(y, "ConvRelu_1")
    x5_out = y
    y = _resize_bilinear(y, x4.shape[1:3])
    y = qconv([x4, y], "ConvRelu_2")
    y = qconv(y, "ConvRelu_3")
    x4_out = y
    y = _resize_bilinear(y, x3.shape[1:3])
    y = qconv([x3, y], "ConvRelu_4")
    y = qconv(y, "ConvRelu_5")
    x3_out = y
    y = _resize_bilinear(y, x2.shape[1:3])
    y = qconv([x2, y], "ConvRelu_6")
    y = qconv(y, "ConvRelu_7")
    x2_out = y
    y = _resize_bilinear(y, x1.shape[1:3])
    y = qconv([x1, y], "ConvRelu_8")
    y = qconv(y, "ConvRelu_9")
    x1_out = y

    outs = (x5_out, x4_out, x3_out, x2_out, x1_out)
    conf_hw = (size_hw[0] // block_size, size_hw[1] // block_size)
    densities, confis = [], []
    for i, o in enumerate(outs):
        b1 = qconv(o, f"MultiBranch_{i}/BasicConv_0")
        b1 = qconv(b1, f"MultiBranch_{i}/BasicConv_1")
        b3 = qconv(o, f"MultiBranch_{i}/BasicConv_2")
        b3 = qconv(b3, f"MultiBranch_{i}/BasicConv_3")
        b5 = qconv(o, f"MultiBranch_{i}/BasicConv_4")
        b5 = qconv(b5, f"MultiBranch_{i}/BasicConv_5")
        d = qconv([b1, b3, b5, o], f"Conv_{i}")  # density 1x1 head IS relu'd
        densities.append(_resize_nearest(d, x1.shape[1:3]))
        cf = _adaptive_avg_pool(o, conf_hw)
        cf = qconv(cf, f"ConvRelu_{10 + 2 * i}")
        cf = qconv(cf, f"ConvRelu_{11 + 2 * i}", relu=False)
        confis.append(_resize_nearest(cf, x1.shape[1:3]))
    conf = jax.nn.softmax(jax.nn.sigmoid(
        jnp.concatenate(confis, axis=-1).astype(jnp.float32)), axis=-1)
    dens = jnp.concatenate(densities, axis=-1).astype(jnp.float32)
    return jnp.sum(dens * conf, axis=-1, keepdims=True)


# -- DSSINet (baselines/DSSINet.py:285-417; shared VGG-PReLU pyramid +
#    CRF message passing — BN-free, so 'folding' is pure extraction).
#    The SHARED stages run once per pyramid chain (f1/f2/f3) and each
#    message-passing conv runs once per CRF iteration: every application
#    gets its own site name (own activation scale) aliasing the same
#    weights. PReLU slopes ride the '__extras__' channel and stay fp.

_DSSI_STAGES = (("stage1", (64, 64), False), ("stage2", (128, 128), True),
                ("stage3", (256, 256, 256), True),
                ("stage4", (512, 512, 512), True))
_DSSI_PASSINGS = (("passing1", 2), ("passing2", 3), ("passing3", 3),
                  ("passing4", 2))


def dssinet_fold(variables) -> Dict:
    params = jax.tree.map(np.asarray, variables["params"])
    folded: Dict[str, Any] = {}
    extras: Dict[str, np.ndarray] = {}
    for sname, chans, _ in _DSSI_STAGES:
        for app in ("f1", "f2", "f3"):
            for i in range(len(chans)):
                folded[f"{sname}/conv{i}@{app}"] = _plain_conv_site(
                    params[sname][f"conv{i}"])
        for i in range(len(chans) - 1):
            extras[f"{sname}/prelu{i}"] = params[sname][f"prelu{i}"]["alpha"]
    for a in ("stage1_act", "stage4_act", "out_prelu"):
        extras[a] = params[a]["alpha"]
    for pname, n in _DSSI_PASSINGS:
        extras[f"{pname}/prelu"] = params[pname]["prelu"]["alpha"]
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                for it in (0, 1):
                    folded[f"{pname}/w_0_{j}_{i}_0@it{it}"] = \
                        _plain_conv_site(params[pname][f"w_0_{j}_{i}_0"])
    for k in range(1, 6):
        folded[f"decoder{k}/c1"] = _plain_conv_site(params[f"decoder{k}"]["c1"])
        folded[f"decoder{k}/c2"] = _plain_conv_site(params[f"decoder{k}"]["c2"])
    for k in range(1, 5):
        folded[f"pw{k}"] = _plain_conv_site(params[f"pw{k}"])
    folded["__extras__"] = extras
    return folded


def dssinet_forward(qconv, x, extras):
    """Mirror of models/baselines/dssinet.py __call__ (eval), itself
    parity-tested against the reference module (tests/test_eval_parity)."""
    from dgvcc_tpu.models.baselines.dssinet import _resize

    def prelu(t, name):
        a = extras[name].astype(t.dtype)
        return jnp.maximum(t, 0) + a * jnp.minimum(t, 0)

    stage_map = {s: (chans, pool) for s, chans, pool in _DSSI_STAGES}

    def stage(t, sname, app):
        chans, pool = stage_map[sname]
        if pool:
            t = _maxpool(t)
        for i in range(len(chans)):
            t = qconv(t, f"{sname}/conv{i}@{app}", relu=False)
            if i < len(chans) - 1:
                t = prelu(t, f"{sname}/prelu{i}")
        return t

    def passing(states, pname):
        n = len(states)
        hidden = list(states)
        for it in range(2):
            new = []
            for i in range(n):
                binary = None
                for j in range(n):
                    if i == j:
                        continue
                    msg = qconv(hidden[j], f"{pname}/w_0_{j}_{i}_0@it{it}",
                                relu=False)
                    binary = msg if binary is None else binary + msg
                binary = prelu(binary, f"{pname}/prelu")
                new.append(jax.nn.relu(hidden[i] + binary))
            hidden = new
        return hidden

    def decoder(t, k):
        t = qconv(t, f"decoder{k}/c1")
        return qconv(t, f"decoder{k}/c2", relu=False)

    n, h, w, c = x.shape
    s1 = _resize(x, (h * 2, w * 2))
    s2 = x
    s3 = _resize(x, (h // 2, w // 2))

    f1_c2 = stage(prelu(stage(s1, "stage1", "f1"), "stage1_act"),
                  "stage2", "f1")
    f2_c1 = stage(s2, "stage1", "f2")
    f1_c2, f2_c1 = passing([f1_c2, f2_c1], "passing1")
    agg4 = [f1_c2, f2_c1]

    f1_c3 = stage(f1_c2, "stage3", "f1")
    f2_c2 = stage(f2_c1, "stage2", "f2")
    f3_c1 = stage(s3, "stage1", "f3")
    f1_c3, f2_c2, f3_c1 = passing([f1_c3, f2_c2, f3_c1], "passing2")
    agg3 = [f1_c3, f2_c2, f3_c1]

    f1_c4 = stage(f1_c3, "stage4", "f1")
    f2_c3 = stage(f2_c2, "stage3", "f2")
    f3_c2 = stage(f3_c1, "stage2", "f3")
    f1_c4, f2_c3, f3_c2 = passing([f1_c4, f2_c3, f3_c2], "passing3")
    agg2 = [f1_c4, f2_c3, f3_c2]

    f2_c4 = stage(f2_c3, "stage4", "f2")
    f3_c3 = stage(f3_c2, "stage3", "f3")
    f2_c4, f3_c3 = passing([f2_c4, f3_c3], "passing4")
    agg1 = [f2_c4, f3_c3]

    f3_c4 = prelu(stage(f3_c3, "stage4", "f3"), "stage4_act")

    dens1 = prelu(decoder(f3_c4, 1), "out_prelu")
    dens2 = prelu(decoder(agg1, 2)
                  + qconv(upsample(dens1, 2), "pw1", relu=False), "out_prelu")
    dens3 = prelu(decoder(agg2, 3)
                  + qconv(upsample(dens2, 2), "pw2", relu=False), "out_prelu")
    dens4 = prelu(decoder(agg3, 4)
                  + qconv(upsample(dens3, 2), "pw3", relu=False), "out_prelu")
    dens5 = jax.nn.relu(decoder(agg4, 5)
                        + qconv(upsample(dens4, 2), "pw4", relu=False))
    return dens5


# family → (fold, forward, fp_sites); fp sites are the tiny 1x1 heads
# and the 2x2-resolution confidence chains (quantizing them saves
# nothing and costs accuracy)
def _family_spec(model):
    from dgvcc_tpu.models.baselines.bl_vgg import BLVGG
    from dgvcc_tpu.models.baselines.csrnet import CSRNet
    from dgvcc_tpu.models.baselines.mcnn import MCNN
    from dgvcc_tpu.models.baselines.sasnet import SASNet

    if isinstance(model, CSRNet):
        return csrnet_fold, csrnet_forward, frozenset({"output_layer"})
    if isinstance(model, MCNN):
        return mcnn_fold, mcnn_forward, frozenset({"fuse"})
    if isinstance(model, BLVGG):
        bn = model.batch_norm
        return (lambda v: bl_fold(v, bn),
                lambda qc, x: bl_forward(qc, x, bn),
                frozenset({"reg3"}))
    if isinstance(model, SASNet):
        bs = model.block_size
        fp = frozenset({f"Conv_{i}" for i in range(5)}
                       | {f"ConvRelu_{i}" for i in range(10, 20)})
        return (sasnet_fold,
                lambda qc, x: sasnet_forward(qc, x, block_size=bs), fp)
    from dgvcc_tpu.models.baselines.dssinet import DSSINet

    if isinstance(model, DSSINet):
        fp = frozenset({f"decoder{k}/c2" for k in range(1, 6)}
                       | {f"pw{k}" for k in range(1, 5)})
        return dssinet_fold, dssinet_forward, fp
    from dgvcc_tpu.models.baselines.cctrans import ALTGVT

    if isinstance(model, ALTGVT):
        from dgvcc_tpu.nn.quant_cctrans import cctrans_fold, cctrans_forward

        depths = tuple(model.depths)
        heads = tuple(model.num_heads)
        wss = tuple(model.wss)
        srs = tuple(model.sr_ratios)
        return (lambda v: cctrans_fold(v, model),
                lambda qc, x, ex: cctrans_forward(
                    qc, x, ex, depths=depths, heads=heads, wss=wss,
                    sr_ratios=srs),
                frozenset({"reg_res2"}))
    return None


def build_quantized(model, variables, calib_frames, dtype=jnp.bfloat16,
                    fused_mem: Optional[bool] = None, min_ch: int = 128):
    """Quantize any supported model for serving: DG family →
    :class:`QuantizedDG`; CSRNet / MCNN / BL-VGG / SASNet / DSSINet /
    CCTrans → :class:`QuantizedConvNet` (CCTrans' Dense layers lower to
    1x1 int8 convs, attention/LayerNorm glue stays fp —
    quant_cctrans.py). Raises a clear error otherwise (the whitening
    counters compute instance statistics at eval and are not foldable —
    see ARCHITECTURE.md).

    ``min_ch``: sites with fewer than this many input AND output
    channels stay bf16. Low-channel convs don't saturate the int8 MXU
    and the x/s→round→clip requantize traffic makes them NET SLOWER —
    measured on v5e at 768x1024: MCNN all-int8 0.61x bf16, SASNet
    all-int8 0.78x (BENCH_NOTES.md). 128 keeps the channel-rich VGG/
    decoder stacks int8 (csrnet 1.23x, bl 1.17x) and leaves the thin
    full-res stages alone; MCNN (max 48 ch) falls back to pure bf16.
    """
    from dgvcc_tpu.models.dg import DGModel

    if isinstance(model, DGModel):
        return QuantizedDG.from_model(model, variables, calib_frames,
                                      dtype=dtype, fused_mem=fused_mem)
    spec = _family_spec(model)
    if spec is None:
        raise ValueError(
            "int8 quantization supports the DG family and the conv(+BN) "
            "baselines csrnet/mcnn/bl/sasnet/dssinet/cctrans; got "
            f"{type(model).__name__} (whitening counters need instance "
            "stats at eval and stay fp)")
    fold_fn, fwd_fn, fp_sites = spec
    folded = fold_fn(variables)
    caps = calibrate_graph(folded, fwd_fn, fp_sites, calib_frames)
    scales = {}
    for k, v in caps.items():
        kh, kw, cin, cout = folded[k]["kernel"].shape
        if min(cin, cout) < min_ch:
            continue  # stays bf16 (requant overhead beats the MXU win)
        scales[k] = max(v, 1e-12) / 127.0
    qn = QuantizedConvNet(folded, scales, fwd_fn, fp_sites, dtype=dtype)
    from dgvcc_tpu.models.baselines.cctrans import ALTGVT as _ALTGVT

    if isinstance(model, _ALTGVT):
        # the ViT behaves unlike the conv families at small batch:
        # measured at 768x1024 B=1 its int8 graph runs 0.68x bf16
        # (28.4 vs 19.4 ms/frame — the fp attention/LayerNorm glue
        # can't amortize the projection requant chains) while at B=8
        # it wins 1.10-1.16x. quantize="auto" honors this floor
        # (serve.py::_prefers_int8); the conv families win at every
        # batch incl. 1 (DG 1.19x, csrnet 1.26x, sasnet 1.10x,
        # dssinet 1.29x — BENCH_NOTES round 5) and keep the default.
        qn.int8_min_batch = 8
    return qn
