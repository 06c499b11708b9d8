"""AOT serving artifacts: the serving program itself, serialized.

`jax.export` captures the fused serving graph (uint8 frames → counts,
normalize + forward + masked count reduction, exactly serve.py's
`_infer`) as portable StableHLO bytes. A replica replays the program
with zero Python model code, zero checkpoint plumbing, and zero
re-tracing — and cross-platform lowering means a CPU build host can
emit TPU artifacts (`platforms=["tpu", "cpu"]`).

Relation to nn/quant_io.py: the int8 artifact stores the finished
program *inputs* and rebuilds the graph by re-tracing model code at
load; the AOT artifact stores the *program*. They compose — export a
VideoCounter that serves a loaded int8 artifact and the resulting AOT
file is a self-contained int8 TPU program.

Weights stay program *arguments* (not baked-in constants), stored
alongside the StableHLO in the same msgpack file: the compiler treats
them as runtime inputs, so one artifact format works for fp and int8
graphs alike and the blobs stay small.

Beyond-reference: the torch reference redeploys by reinstantiating
model classes + state_dicts on every host (main.py --task test); it has
no ahead-of-time program artifact.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import numpy as np

AOT_FORMAT = "dgvcc-aot-v1"


# ---------------------------------------------------------------- weights

def _pack_tree(obj) -> Dict[str, Any]:
    """Self-describing msgpack encoding of a weights pytree.

    Container types (dict vs list vs tuple) are recorded exactly —
    `Exported.call` validates the argument pytree against the traced
    in_tree, so a tuple that came back as a list would be rejected.
    Array dtypes are stored by name and the raw bytes kept verbatim
    (bf16/int8 included), so the loaded leaves are bit-identical to the
    exported program's declared input avals.
    """
    if isinstance(obj, dict):
        return {"t": "dict", "v": {k: _pack_tree(v) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "v": [_pack_tree(v) for v in obj]}
    a = np.asarray(obj)
    return {"t": "arr", "dtype": a.dtype.name, "shape": list(a.shape),
            "data": a.tobytes()}


def _np_dtype(name: str):
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 & friends live here

        return np.dtype(getattr(ml_dtypes, name))


def _unpack_tree(doc: Dict[str, Any]):
    t = doc["t"]
    if t == "dict":
        return {k: _unpack_tree(v) for k, v in doc["v"].items()}
    if t in ("list", "tuple"):
        seq = [_unpack_tree(v) for v in doc["v"]]
        return seq if t == "list" else tuple(seq)
    return np.frombuffer(doc["data"], dtype=_np_dtype(doc["dtype"])
                         ).reshape(doc["shape"])


# ----------------------------------------------------------------- export

def _padded_hw(h: int, w: int, bucket: int) -> Tuple[int, int]:
    return (math.ceil(h / bucket) * bucket, math.ceil(w / bucket) * bucket)


def export_serving(counter, shapes: Iterable[Tuple[int, int, int]],
                   platforms: Optional[List[str]] = None) -> Dict[str, Any]:
    """Export a VideoCounter's whole-frame serving program per shape.

    ``shapes`` is an iterable of (batch, height, width) the deployment
    will serve; each pads to the counter's 64-bucket (exactly like live
    serving) and exports one StableHLO program keyed by the padded
    shape. ``platforms`` lists lowering targets (e.g. ["tpu", "cpu"]);
    default is this host's platform.
    """
    from jax import export as jexport

    if counter.mesh is not None:
        raise ValueError(
            "AOT export is single-device; serve artifact replicas "
            "data-parallel by loading the file once per process/chip")
    if getattr(counter, "_quant_pending", False):
        raise ValueError("quantized counter is uncalibrated — pass "
                         "calib_frames (or count one real batch) before export")
    if getattr(counter, "auto", False):
        raise ValueError(
            "quantize='auto' counters pick precision per dispatch and "
            "cannot export a single program — build the counter with "
            "quantize=True (int8) or False (fp) for AOT export")

    weights = counter._weights()
    wspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        weights)

    programs: Dict[str, bytes] = {}
    for (b, h, w) in shapes:
        if counter.tile_size and max(h, w) > counter.tile_threshold:
            raise ValueError(
                f"shape {b}x{h}x{w} exceeds tile_threshold="
                f"{counter.tile_threshold}; AOT exports the whole-frame "
                "program — raise the threshold or export smaller frames")
        bh, bw = _padded_hw(h, w, counter.bucket)
        key = f"{int(b)}x{bh}x{bw}"
        if key in programs:
            continue
        exp = jexport.export(counter._infer, platforms=platforms)(
            wspec,
            jax.ShapeDtypeStruct((int(b), bh, bw, 3), np.uint8),
            jax.ShapeDtypeStruct((int(b), 2), np.int32))
        programs[key] = bytes(exp.serialize())

    return {
        "format": AOT_FORMAT,
        "platforms": list(platforms) if platforms
        else [jexport.default_export_platform()],
        "bucket": int(counter.bucket),
        "quantized": counter.quantized is not None,
        "jax_version": jax.__version__,
        "weights": _pack_tree(jax.device_get(weights)),
        "programs": programs,
    }


def save_aot(doc: Dict[str, Any], path: str) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(doc))


# ------------------------------------------------------------------ serve

class AotCounter:
    """Serve counts from an AOT artifact — no model code, no re-trace.

    Drop-in for serve.VideoCounter where it matters (`count_frames`,
    `stream`, `.quantized`), so `--task serve` and serve_http.py work
    unchanged. Dispatch: a frame batch pads to the 64-bucket, then runs
    the exported program for that padded (H, W) with the smallest
    exported batch that fits (padding with zero frames whose zero valid
    extents mask them out); batches larger than every exported batch
    run in chunks.
    """

    def __init__(self, doc: Dict[str, Any]):
        from jax import export as jexport

        if doc.get("format") != AOT_FORMAT:
            raise ValueError(f"not a {AOT_FORMAT} artifact "
                             f"(format={doc.get('format')!r})")
        here = jax.default_backend()
        plats = [p.lower() for p in doc["platforms"]]
        if here.lower() not in plats:
            raise ValueError(
                f"artifact was lowered for {plats} but this host's "
                f"backend is {here!r} — re-export with platforms="
                f"{sorted(set(plats + [here]))}")
        self.bucket = int(doc["bucket"])
        self.quantized = True if doc.get("quantized") else None
        self.weights = jax.device_put(_unpack_tree(doc["weights"]))
        self._programs = {}
        self._by_hw: Dict[Tuple[int, int], List[int]] = {}
        for key, blob in doc["programs"].items():
            b, h, w = (int(x) for x in key.split("x"))
            exp = jexport.deserialize(bytearray(blob))
            # jit the exported call ONCE per program: Exported.call is
            # a plain traceable function, so calling it directly would
            # re-trace the whole deserialized module on EVERY dispatch
            # (measured: ~0.5-0.8 s/call of pure host tracing on the
            # big ViT artifacts — 4-5x throughput loss). Under jit the
            # trace+compile happens once and later dispatches hit the
            # executable cache.
            self._programs[(b, h, w)] = jax.jit(exp.call)
            self._by_hw.setdefault((h, w), []).append(b)
        for sizes in self._by_hw.values():
            sizes.sort()

    @classmethod
    def load(cls, path: str) -> "AotCounter":
        from flax import serialization

        with open(path, "rb") as f:
            return cls(serialization.msgpack_restore(f.read()))

    # -- dispatch ----------------------------------------------------

    def _resolve(self, b: int, bh: int, bw: int) -> Tuple[int, Any]:
        sizes = self._by_hw.get((bh, bw))
        if not sizes:
            have = sorted(f"{bb}x{hh}x{ww}"
                          for (bb, hh, ww) in self._programs)
            raise ValueError(
                f"no exported program for padded frame {bh}x{bw} "
                f"(bucket={self.bucket}); artifact has: {have}")
        fit = next((s for s in sizes if s >= b), sizes[-1])
        return fit, self._programs[(fit, bh, bw)]

    def _launch(self, frames: np.ndarray):
        """(B, H, W, 3) uint8 → list of device-array count futures."""
        b, h, w, c = frames.shape
        bh, bw = _padded_hw(h, w, self.bucket)
        bexp, _ = self._resolve(b if b else 1, bh, bw)
        futs = []
        for lo in range(0, b, bexp):
            chunk = frames[lo:lo + bexp]
            n = chunk.shape[0]
            padded = np.zeros((bexp, bh, bw, c), frames.dtype)
            padded[:n, :h, :w] = chunk
            valid = np.zeros((bexp, 2), np.int32)
            valid[:n] = (h, w)
            _, prog = self._resolve(bexp, bh, bw)
            futs.append((prog(self.weights, padded, valid), n))
        return futs

    def count_frames(self, frames: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames)
        return np.concatenate([np.asarray(f)[:n]
                               for f, n in self._launch(frames)])

    def stream(self, frame_batches: Iterable[np.ndarray],
               prefetch: int = 2) -> Iterator[np.ndarray]:
        in_flight: List[List] = []
        for frames in frame_batches:
            in_flight.append(self._launch(np.asarray(frames)))
            if len(in_flight) > prefetch:
                done = in_flight.pop(0)
                yield np.concatenate([np.asarray(f)[:n] for f, n in done])
        for done in in_flight:
            yield np.concatenate([np.asarray(f)[:n] for f, n in done])
