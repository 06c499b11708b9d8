"""Export flax variables back to a reference torch state_dict.

The missing half of checkpoint migration: ``nn/torch_io.py`` imports
trained reference checkpoints (torch → flax); this module exports TPU-
trained weights back out (flax → torch), so a model fine-tuned here can
be loaded by the reference codebase (``model.load_state_dict(...)`` on
models/models.py, models/baselines/*, models/SW|ibnnet|ISW) or any
torch tooling downstream.

Rather than hand-writing an inverse of every family converter (and
keeping two mapping definitions in sync forever), the inverse is
DERIVED from the forward converter by probing:

1. Build probe state_dicts shaped like the template where every tensor
   element holds a globally unique integer id. Converters may cast
   through float32 (e.g. the SW running-stat path, torch_io.py), which
   is only exact below 2^24 — smaller than a 30M-element checkpoint —
   so the id is split across TWO probe passes: pass A carries
   ``id % 4096``, pass B ``id // 4096``. Each component stays far below
   2^24 and survives any float32 round-trip exactly; the id is
   recombined per element afterwards (exact up to 2^36 elements).
2. Run the real, eval-parity-tested forward converter
   (``load_reference_checkpoint``) on each probe.
3. Every flax leaf now literally contains the ids of the template
   elements that feed it — any composition of transpose / reshape /
   slice / concat / re-indexing the converter performs is recovered
   element-by-element. Leaves the converter does not touch keep a -1
   filler and are skipped.

The derivation validates itself: ids must round-trip as exact integers
(a lossy cast anywhere in the converter would corrupt them → loud
failure, never a silently wrong export) and no template element may be
claimed twice with conflicting values.

A template state_dict is required for the torch-side key names and
shapes — users migrating from the reference have one (the checkpoint
they imported); from-scratch users can take any same-architecture
reference checkpoint or a randomly initialized reference module's
``state_dict()``. Keys the converters never consume (e.g. BatchNorm
``num_batches_tracked``) are preserved from the template.
"""

from __future__ import annotations

import bisect
from typing import Dict, List, Tuple

import numpy as np


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    from flax.traverse_util import flatten_dict

    if not isinstance(tree, dict):
        return [(prefix, np.asarray(tree))]
    return [(prefix + path, np.asarray(leaf)) for path, leaf in
            sorted(flatten_dict(tree).items())]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def derive_export_map(variables: Dict, template_sd: Dict[str, np.ndarray],
                      model) -> Dict[Tuple[str, ...], Tuple[str, np.ndarray]]:
    """Probe the forward converter once; return
    ``{flax_leaf_path: (torch_key, flat_index_array)}`` such that
    ``leaf.flat[i] == sd[torch_key].flat[index[i]]`` — i.e. the exact
    element-level correspondence the converter implements."""
    from flax.core import unfreeze

    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    # globally unique ids per template element, split base-4096 across
    # two probe passes so each component survives a float32 cast exactly
    BASE = 4096
    offsets: Dict[str, Tuple[int, int]] = {}
    off = 0
    for k, v in template_sd.items():
        v = np.asarray(v)
        n = int(np.prod(v.shape)) if v.ndim else 1
        offsets[k] = (off, n)
        off += n
    if off >= BASE * (1 << 24):
        raise ValueError(f"template too large for exact probing ({off})")
    bounds = sorted((lo, lo + n, k) for k, (lo, n) in offsets.items())

    def _probe_pass(component) -> Dict[Tuple[str, ...], np.ndarray]:
        probe_sd = {}
        for k, v in template_sd.items():
            lo, n = offsets[k]
            ids = lo + np.arange(n, dtype=np.int64)
            probe_sd[k] = component(ids).astype(np.float64).reshape(
                np.asarray(v).shape)
        # -1-filled variables: leaves the converter leaves alone stay -1
        filler = {
            "params": _fill(unfreeze(variables["params"])),
            "batch_stats": _fill(unfreeze(variables.get("batch_stats", {}))),
        }
        probed = load_reference_checkpoint(filler, probe_sd, model)
        out = {}
        for col in ("params", "batch_stats"):
            for path, leaf in _flatten(probed.get(col, {}), (col,)):
                arr = np.asarray(leaf, np.float64).ravel()
                ids = np.rint(arr).astype(np.int64)
                if not np.array_equal(ids.astype(np.float64), arr):
                    raise ValueError(
                        f"converter output at {'/'.join(path)} is not a "
                        "pure re-indexing of the torch tensors (probe ids "
                        "came back non-integral) — cannot derive an exact "
                        "export")
                out[path] = ids
        return out

    lo_pass = _probe_pass(lambda ids: ids % BASE)
    hi_pass = _probe_pass(lambda ids: ids // BASE)

    mapping: Dict[Tuple[str, ...], Tuple[str, np.ndarray]] = {}
    for path, lo_ids in lo_pass.items():
        hi_ids = hi_pass[path]
        untouched = (lo_ids == -1) & (hi_ids == -1)
        if untouched.all():
            continue  # untouched leaf (not sourced from the template)
        if (lo_ids == -1).any() or (hi_ids == -1).any():
            raise ValueError(
                f"leaf {'/'.join(path)} is only PARTIALLY fed by the "
                "template state_dict — refusing a partial export")
        ids = hi_ids * BASE + lo_ids
        key = _locate(bounds, int(ids.min()))
        lo, n = offsets[key]
        if int(ids.max()) >= lo + n:
            raise ValueError(
                f"leaf {'/'.join(path)} mixes elements of multiple "
                "torch tensors — unsupported converter structure")
        mapping[path] = (key, ids - lo)

    # validate the derived mapping against the REAL template values: run
    # the converter once more on template_sd and require every mapped
    # leaf to equal its claimed template elements. This catches the one
    # failure mode integer probing cannot see — a leaf the converter
    # fills with a small integral CONSTANT (e.g. a synthesized zero
    # bias), which probes like "fed by template element c*(BASE+1)" but
    # will not match the template's float there.
    filler = {
        "params": _fill(unfreeze(variables["params"])),
        "batch_stats": _fill(unfreeze(variables.get("batch_stats", {}))),
    }
    checked = load_reference_checkpoint(
        filler, {k: np.asarray(v, np.float64) for k, v in
                 template_sd.items()}, model)
    real = {}
    for col in ("params", "batch_stats"):
        real.update(_flatten(checked.get(col, {}), (col,)))
    for path, (key, idx) in mapping.items():
        # converters may cast through float32 (sw stats) — compare there
        want = np.asarray(template_sd[key], np.float64).ravel()[idx].astype(
            np.float32)
        got = np.asarray(real[path], np.float64).ravel().astype(np.float32)
        if not np.array_equal(got, want):
            raise ValueError(
                f"derived mapping for {'/'.join(path)} does not reproduce "
                f"the converter's output from {key} — the converter is "
                "not a pure re-indexing there; refusing to export")
    return mapping


def _fill(tree):
    if isinstance(tree, dict):
        return {k: _fill(v) for k, v in tree.items()}
    a = np.asarray(tree)
    return np.full(a.shape, -1.0, np.float64)


def _locate(bounds, idx: int) -> str:
    """bounds is sorted by lo and the ranges are disjoint — binary
    search the last range starting at or before idx."""
    i = bisect.bisect_right(bounds, (idx, float("inf"), "")) - 1
    if i >= 0:
        lo, hi, k = bounds[i]
        if lo <= idx < hi:
            return k
    raise ValueError(f"probe id {idx} outside every template tensor")


def export_reference_checkpoint(variables: Dict,
                                template_sd: Dict[str, np.ndarray],
                                model) -> Dict[str, np.ndarray]:
    """flax ``variables`` → torch-layout ``{key: ndarray}`` state_dict.

    Inverse of ``torch_io.load_reference_checkpoint`` for every family
    that converter supports (DG, models2 regressors/generators, the
    conv baselines, the whitening counters). Values are float32;
    template keys the converters never consume are passed through
    unchanged. Use :func:`save_reference_checkpoint` to write a
    ``.pth`` the reference can ``torch.load``.
    """
    mapping = derive_export_map(variables, template_sd, model)
    # mapped keys export as float32 (the trained precision) even if the
    # template was saved lower-precision — torch's load_state_dict casts
    # into the module dtype, and downcasting here would silently break
    # the bit-exact round trip. Untouched keys pass through as-is
    # (mapped keys are fully rebuilt below — asserted — so only the
    # unmapped ones need copying).
    mapped_keys = {key for key, _ in mapping.values()}
    out = {k: np.array(v, copy=True) for k, v in template_sd.items()
           if k not in mapped_keys}
    buf: Dict[str, np.ndarray] = {}
    written: Dict[str, np.ndarray] = {}
    for path, (key, idx) in mapping.items():
        vals = np.asarray(_get(variables, path), np.float32).ravel()
        if key not in buf:
            buf[key] = np.empty(int(np.asarray(template_sd[key]).size),
                                np.float32)
            written[key] = np.zeros(buf[key].size, bool)
        # within-leaf duplicate indices (a converter broadcasting one
        # torch element into several leaf positions): all writes to one
        # element must agree, else last-write-wins would be silent
        order = np.argsort(idx, kind="stable")
        si, sv = idx[order], vals[order]
        same = si[1:] == si[:-1]
        if same.any() and not np.allclose(sv[1:][same], sv[:-1][same],
                                          rtol=1e-5, atol=1e-6):
            raise ValueError(
                f"leaf {'/'.join(path)} writes conflicting values into "
                f"repeated elements of torch key {key}")
        # cross-leaf duplicates (shared torch modules imported into
        # several flax sites): exported values must agree too
        dup = written[key][idx]
        if dup.any():
            prev = buf[key][idx[dup]]
            if not np.allclose(prev, vals[dup], rtol=1e-5, atol=1e-6):
                raise ValueError(
                    f"torch key {key} receives conflicting values from "
                    f"{'/'.join(path)} (shared-module divergence?)")
        buf[key][idx] = vals
        written[key][idx] = True
    for key, flat in buf.items():
        # all-or-nothing coverage: a partially-written tensor would
        # silently interleave trained values with stale template values
        # — the one mixed state the per-leaf guards can't see
        if not written[key].all():
            n = int((~written[key]).sum())
            raise ValueError(
                f"torch key {key} is only partially covered by the "
                f"export ({n} of {written[key].size} elements never "
                "written) — refusing a mixed trained/template tensor")
        out[key] = flat.reshape(np.asarray(template_sd[key]).shape)
    return out


def save_reference_checkpoint(path: str, sd: Dict[str, np.ndarray]) -> None:
    """Write an exported state_dict as a ``torch.save`` file the
    reference's ``load_state_dict`` accepts."""
    import torch

    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, path)
