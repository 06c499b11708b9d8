"""Persisted int8 serving artifacts.

`build_quantized` (nn/quant.py) folds BN, calibrates activation scales
on real frames, and quantizes weights — work that needs the fp
checkpoint, representative imagery, and fp forward passes. None of that
belongs on a serving replica: `save_quantized` writes the finished
program inputs (int8 kernels + per-kernel scales, f32 biases, fp-site
kernels, memory bank, activation scales, model identity) as one msgpack
file, and `load_quantized` rebuilds the serving graph from it with zero
recalibration — no checkpoint, no calib frames, no fp pass.

Beyond-reference: the reference has no quantization (its serving analog
is the serial eval loop, trainers/trainer.py:90-103). The artifact is
the deploy unit for serve.VideoCounter.from_artifact / the CLI's
`--task quantize` → `--task serve --artifact`.

Format notes: arrays are stored exactly as the serving program consumes
them (w8 int8, ws/bias f32) except fp-site kernels and the memory bank,
which are upcast bf16→f32 for msgpack portability (exact; bf16 ⊂ f32)
and cast back on load. Weight quantization is deterministic, so a
loaded artifact reproduces the in-memory graph bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

ARTIFACT_FORMAT = "dgvcc-int8-v1"


def _np_sites(qsites: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for name, site in qsites.items():
        if "w8" in site:
            out[name] = {"w8": np.asarray(site["w8"]),
                         "ws": np.asarray(site["ws"], np.float32),
                         "bias": np.asarray(site["bias"], np.float32)}
        else:
            out[name] = {"kernel": np.asarray(site["kernel"]
                                              ).astype(np.float32),
                         "bias": np.asarray(site["bias"], np.float32)}
    return out


def _plain(v):
    """msgpack-safe model params: flax serializes with strict_types, so
    tuples (e.g. cctrans embed_dims) must become lists up front."""
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v


def save_quantized(q, path: str, model_name: str,
                   model_params: Optional[Dict[str, Any]] = None) -> None:
    """Write a QuantizedDG / QuantizedConvNet as a deployable artifact.

    ``model_name`` / ``model_params`` are the registry identity
    (`MODELS.build(model_name, **model_params)`) — the loader rebuilds
    the model skeleton from them (eval-graph flags like use_mem /
    block_size come from the module, not the artifact).
    """
    import jax

    from dgvcc_tpu.nn.quant import QuantizedConvNet, QuantizedDG

    doc: Dict[str, Any] = {
        "format": ARTIFACT_FORMAT,
        "model_name": model_name,
        "model_params": _plain(dict(model_params or {})),
        "dtype": np.dtype(q.dtype).name,
        "scales": dict(q.scales),
        "sites": _np_sites(q.qparams["sites"]),
    }
    if isinstance(q, QuantizedDG):
        doc["family"] = "dg"
        if "mem" in q.qparams:
            doc["mem"] = np.asarray(q.qparams["mem"]).astype(np.float32)
    elif isinstance(q, QuantizedConvNet):
        doc["family"] = "convnet"
        if "extras" in q.qparams:
            doc["extras"] = jax.tree.map(
                lambda a: np.asarray(a, np.float32), q.qparams["extras"])
    else:
        raise TypeError(f"not a quantized serving graph: {type(q).__name__}")

    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(doc))


class LoadedArtifact(NamedTuple):
    quantized: Any   # QuantizedDG | QuantizedConvNet, ready to call
    model: Any       # the registry-built module (eval-flag source)
    doc: Dict[str, Any]  # raw artifact fields (model_name, scales, ...)


def load_quantized(path: str, dtype=None,
                   fused_mem: Optional[bool] = None) -> LoadedArtifact:
    """Rebuild the int8 serving graph from a saved artifact.

    ``dtype`` overrides the stored serving dtype (e.g. float32 on CPU);
    ``fused_mem`` overrides the DG memory-attention kernel choice
    (default: Pallas on TPU, einsum elsewhere — decided at load, not
    baked into the artifact).
    """
    from flax import serialization

    from dgvcc_tpu.core.registry import MODELS
    from dgvcc_tpu.nn.quant import (QuantizedConvNet, QuantizedDG,
                                    _family_spec)
    import dgvcc_tpu.models  # noqa: F401  (registry population)

    with open(path, "rb") as f:
        doc = serialization.msgpack_restore(f.read())
    if doc.get("format") != ARTIFACT_FORMAT:
        raise ValueError(f"{path}: not a {ARTIFACT_FORMAT} artifact "
                         f"(format={doc.get('format')!r})")
    dt = dtype if dtype is not None else getattr(jnp, doc["dtype"])
    model = MODELS.build(doc["model_name"], dtype=dt,
                         **doc.get("model_params", {}))
    if doc["family"] == "dg":
        q = QuantizedDG.from_sites(doc["sites"], doc["scales"], model,
                                   mem=doc.get("mem"), dtype=dt,
                                   fused_mem=fused_mem)
    elif doc["family"] == "convnet":
        spec = _family_spec(model)
        if spec is None:  # artifact names a model the recipe can't serve
            raise ValueError(f"{path}: model {doc['model_name']!r} has no "
                             "int8 serving spec")
        _, fwd_fn, fp_sites = spec
        q = QuantizedConvNet.from_sites(doc["sites"], doc["scales"], fwd_fn,
                                        fp_sites, extras=doc.get("extras"),
                                        dtype=dt)
    else:
        raise ValueError(f"{path}: unknown family {doc['family']!r}")
    return LoadedArtifact(q, model, doc)
