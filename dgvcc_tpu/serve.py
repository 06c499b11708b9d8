"""Video-stream serving: fused decode-to-count inference.

The BASELINE north star: per-frame density regression over video
streams, fused end-to-end so decode-to-count latency hits TPU
speed-of-light. Host work stops at JPEG decode (uint8 frames);
everything after — normalize, pad, forward, count reduction — is ONE
jitted program per frame-shape bucket, fed asynchronously so TPU
compute overlaps host decode.

Usage:
    counter = VideoCounter.from_checkpoint("final", "logs/x/best.ckpt")
    counts = counter.count_frames(frames_uint8)   # (B, H, W, 3) uint8
    for c in counter.stream(frame_iter):          # pipelined streaming
        ...
"""

from __future__ import annotations

import functools
import math
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgvcc_tpu.core.registry import MODELS

# Int8-vs-bf16 crossover for quantize="auto", calibrated from the
# measured v5e shape x batch grid (BENCH_NOTES.md "Round 5: int8/bf16
# crossover"). After the memory-attention batch-routing fix
# (models/dg.py::MemoryBank — the fused Pallas kernel integrated
# pathologically below B=4 and DOMINATED the small-batch int8 numbers,
# 20.6 ms/frame at 768x1024 B=1), the selective-min_ch int8 graph wins
# at EVERY measured point: shapes 128^2-1088x1920, batches 1-32,
# 1.03-2.3x bf16 (B=1 768x1024: 8.0 vs 9.5 ms/frame = 1.19x). The
# round-4 "int8 loses at B=1" guidance was that bug, not a property of
# int8 — a bare int8 conv chain runs 2x bf16 even at B=1 (microconv
# rows). Default law: serve the quantized graph for any element of
# 256^2 or larger. Below the per-element floor the measured tail is
# CHAOTIC (XLA picks shape-specific conv lowerings: 128^2 int8 wins
# 2.3x at B=8 but loses 2.6x at B=4 and 0.9x at B=1 — sub-millisecond
# dispatches either way), so tiny elements stay bf16: the worst
# forgone win there is ~0.2 ms/dispatch while the avoided loss is
# ~1.1 ms. Per-family site selection (min_ch) separately degrades
# int8-negative families to pure bf16 at build time. An integer
# auto_threshold opts a deployment into a per-chip-batch rule instead.
AUTO_INT8_MIN_BATCH = 1
AUTO_INT8_MIN_PIXELS = 65_536  # per element (frame / tile / H-shard)


class VideoCounter:
    """Batched, shape-bucketed crowd counting over raw uint8 frames."""

    def __init__(self, model, variables, log_para: float = 1000.0,
                 bucket: int = 64, dtype=jnp.bfloat16, quantize=False,
                 calib_frames: Optional[np.ndarray] = None,
                 tile_size: int = 768, tile_threshold: int = 4096,
                 mesh=None, shard: str = "batch", quantized=None,
                 auto_threshold: Optional[int] = None):
        self.model = model
        self.variables = variables
        self.log_para = log_para
        self.bucket = bucket
        self.dtype = dtype
        # data-parallel serving: with a jax.sharding.Mesh (axis 'data'),
        # weights replicate and the frame batch shards over the axis —
        # per-frame counts are independent, so the only collective XLA
        # inserts is for the tiled path's per-frame tile-sum. The
        # reference serves one GPU at a time (its closest analog,
        # --task test, is a serial loop — trainers/trainer.py:90-103);
        # here one VideoCounter saturates a whole slice.
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size) if mesh is not None else 1
        # shard="spatial" slices each FRAME's height across the mesh
        # instead of the batch: GSPMD spatially partitions every conv
        # (halo rows ride ICI as collective-permutes — verified: the DG
        # graph compiles to 114 halo exchanges and ZERO all-gathers, so
        # the frame never rematerializes on one chip) and the per-frame
        # density sum becomes one tiny all-reduce. This is the regime
        # batch-DP can't touch: B=1 giant frames (gigapixel scenes,
        # HBM-overflow inputs) count as ONE image across the slice,
        # numerically equal to the single-device whole-frame forward
        # (tests/test_serve_mesh.py asserts ≤1e-5 rel).
        if shard not in ("batch", "spatial"):
            raise ValueError(f"shard must be 'batch' or 'spatial', got {shard!r}")
        self.shard = shard
        # frames whose max dimension exceeds tile_threshold run through
        # the tiled path (tile_size x tile_size tile batch) instead of
        # one monolithic multi-megapixel program; tile_size=0 disables.
        # Default threshold is high (4096): through this container's
        # relay the tile batch pays per-transfer RTT and loses to the
        # monolithic program (measured, BENCH_NOTES.md "Large-frame
        # serving"), so tiling is reserved for frames big enough to
        # threaten HBM/compile blowup; on a direct-attached host lower
        # it (e.g. 1536) to bound the compile set per unique frame size
        self.tile_size = tile_size
        self.tile_threshold = tile_threshold
        # quantize="auto": keep BOTH serving graphs, serve fp until the
        # first batch calibrates the int8 graph, then apply the
        # measured crossover law (AUTO_INT8_MIN_BATCH above — with the
        # round-5 constants that is "int8 whenever calibrated": the
        # selective-int8 graph measured faster at every shape x batch
        # point once the memory-attention routing bug was fixed).
        # Passing an int `auto_threshold` opts into a plain
        # per-chip-batch rule at that threshold for deployments that
        # calibrated their own crossover.
        if quantize not in (False, True, "auto"):
            raise ValueError(f"quantize must be False, True or 'auto'; "
                             f"got {quantize!r}")
        self.auto = quantize == "auto"
        self.auto_threshold = auto_threshold
        if self.auto and variables is None:
            raise ValueError("quantize='auto' needs fp variables; an "
                             "int8 artifact carries no fp weights "
                             "(serve it with the default quantize)")
        self.quantized = None
        self._quant_pending = False
        self.dispatches = {"fp": 0, "int8": 0}  # per-precision counters
        if quantized is not None:
            # prebuilt int8 graph (a loaded artifact, nn/quant_io.py) —
            # already folded + calibrated, nothing to do but place it
            quantize = True
            self.quantized = quantized
            self._place_qparams()
        elif quantize:
            # int8 PTQ serving graph (nn/quant.py): ~1.5x the bf16 fps
            # on v5e. Supports the DG family + the conv(+BN) baselines
            # (csrnet/mcnn/bl/sasnet/dssinet/cctrans). Activation scales
            # MUST come from
            # real imagery — with calib_frames they're calibrated now,
            # otherwise calibration happens lazily on the first batch.
            from dgvcc_tpu.models.baselines.bl_vgg import BLVGG
            from dgvcc_tpu.models.baselines.cctrans import ALTGVT
            from dgvcc_tpu.models.baselines.csrnet import CSRNet
            from dgvcc_tpu.models.baselines.dssinet import DSSINet
            from dgvcc_tpu.models.baselines.mcnn import MCNN
            from dgvcc_tpu.models.baselines.sasnet import SASNet
            from dgvcc_tpu.models.dg import DGModel

            if not isinstance(model, (DGModel, CSRNet, MCNN, BLVGG,
                                      SASNet, ALTGVT, DSSINet)):
                raise ValueError(
                    "quantize=True supports the DG family "
                    "(base/mem/memadd/cls/memcls/final) and the "
                    "csrnet/mcnn/bl/sasnet/dssinet/cctrans baselines; "
                    f"got {type(model).__name__}")
            if calib_frames is None:
                self._quant_pending = True
            else:
                self._build_quantized(np.asarray(calib_frames))

        def density(weights, x, use_q):
            if use_q:
                # weights IS qparams here — passed as a jit argument so
                # the folded int8 weights are program inputs, not
                # constants baked into the trace
                out = self.quantized._forward(weights, x)
                d = out[0] if isinstance(out, tuple) else out
                return d.astype(jnp.float32)
            out = self.model.apply(weights, x)
            return (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)

        def masked_counts(weights, frames_u8, valid_hw, use_q):
            # uint8 → [-1, 1] normalize (Normalize(0.5, 0.5)) fused with
            # the forward; padded border zeroed out of the count.
            # valid_hw: (B, 2) per-sample real-pixel extents.
            x = frames_u8.astype(jnp.float32) / 255.0
            x = ((x - 0.5) / 0.5).astype(dtype)
            d = density(weights, x, use_q)
            h_idx = jnp.arange(d.shape[1])[None, :, None, None]
            w_idx = jnp.arange(d.shape[2])[None, None, :, None]
            scale_h = d.shape[1] / frames_u8.shape[1]
            scale_w = d.shape[2] / frames_u8.shape[2]
            vh = valid_hw[:, 0][:, None, None, None]
            vw = valid_hw[:, 1][:, None, None, None]
            mask = (h_idx < vh * scale_h) & (w_idx < vw * scale_w)
            return jnp.sum(d * mask, axis=(1, 2, 3)) / log_para

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from dgvcc_tpu.parallel.mesh import DATA_AXIS

            rep = NamedSharding(mesh, P())
            if shard == "spatial":
                # dim 1 shards: H of whole frames, T of the tile batch
                # (each frame's tiles spread over the mesh; the in-jit
                # per-frame sum is the only cross-shard reduce). valid_hw
                # and counts replicate — counts are O(B) scalars.
                part = NamedSharding(mesh, P(None, DATA_AXIS))
                jit_kw = dict(in_shardings=(rep, part, rep),
                              out_shardings=rep)
            else:
                row = NamedSharding(mesh, P(DATA_AXIS))
                # weights replicated, batch dim sharded; _launch pads the
                # batch to a multiple of the axis size. The tiled path's
                # (B, T, t, t, 3) input shards on B so every tile of a
                # frame stays on that frame's shard.
                jit_kw = dict(in_shardings=(rep, row, row),
                              out_shardings=row)
        else:
            jit_kw = {}

        def make_graphs(use_q):
            @functools.partial(jax.jit, **jit_kw)
            def infer(weights, frames_u8, valid_hw):
                return masked_counts(weights, frames_u8, valid_hw, use_q)

            @functools.partial(jax.jit, **jit_kw)
            def infer_tiled(weights, tiles_u8, valid_hw):
                # tiles_u8: (B, T, t, t, 3) — each frame cut into T
                # static tiles; forward as one (B*T) batch, per-frame
                # sums INSIDE jit so streaming still gets a single (B,)
                # device future
                b, t = tiles_u8.shape[:2]
                flat = tiles_u8.reshape((b * t,) + tiles_u8.shape[2:])
                counts = masked_counts(weights, flat, valid_hw, use_q)
                return counts.reshape(b, t).sum(axis=1)

            return infer, infer_tiled

        # jit traces lazily, so defining both precisions costs nothing
        # until a graph is actually dispatched
        self._infer_fp, self._infer_tiled_fp = make_graphs(False)
        self._infer_q, self._infer_tiled_q = make_graphs(True)
        # the constructor-precision graphs (quantize=True -> int8):
        # the aot export path (nn/aot.py) and the mesh tests lower
        # these, always paired with _weights(). An auto counter has no
        # single pinned precision — pin the fp pair so the pinned
        # graph and _weights() stay consistent (export_serving rejects
        # auto counters outright; live dispatch uses _select instead)
        if quantize and not self.auto:
            self._infer, self._infer_tiled = self._infer_q, self._infer_tiled_q
        else:
            self._infer, self._infer_tiled = self._infer_fp, self._infer_tiled_fp

    def _build_quantized(self, calib_frames: np.ndarray):
        """Fold + calibrate + quantize on real frames (uint8 or already
        normalized float)."""
        from dgvcc_tpu.nn.quant import build_quantized

        c = np.asarray(calib_frames)
        if c.dtype == np.uint8:  # same normalize as infer()
            c = (c.astype(np.float32) / 255.0 - 0.5) / 0.5
        # activation absmax only needs representative pixels — cap the
        # calibration crop so lazy calibration on a giant first frame
        # never runs one monolithic multi-megapixel f32 program (the
        # exact blowup the tiled serving path exists to avoid)
        ch, cw = min(c.shape[1], 768), min(c.shape[2], 768)
        ch -= ch % 64
        cw -= cw % 64
        c = c[:, :max(ch, 64), :max(cw, 64)]
        self.quantized = build_quantized(
            self.model, self.variables, jnp.asarray(c, jnp.float32),
            dtype=self.dtype)
        self._place_qparams()
        self._quant_pending = False

    def _place_qparams(self):
        if self.mesh is not None:
            # replicate the folded int8 weights across the mesh once —
            # otherwise every infer call would reshard them
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.quantized.qparams = jax.device_put(
                self.quantized.qparams, NamedSharding(self.mesh, P()))

    def _weights(self):
        """The jit argument paired with the pinned `_infer` graphs
        (AOT export, mesh lowering tests): fp variables, or qparams
        once quantized. Auto counters pin fp (their precision is
        per-dispatch via _select, never via the pinned pair)."""
        return (self.quantized.qparams
                if self.quantized is not None and not self.auto
                else self.variables)

    def _dispatch_batch(self, frames: np.ndarray) -> int:
        """The per-chip batch the dispatched program will see — the
        quantity that decides whether int8 beats bf16 (MXU fill)."""
        b, h, w, _ = frames.shape
        tiled = self.tile_size and max(h, w) > self.tile_threshold
        if tiled:
            t = self.tile_size
            n_tiles = math.ceil(h / t) * math.ceil(w / t)
            if self.shard == "spatial" and self.n_shards > 1:
                # the TILE dim shards over the mesh (_launch_exact):
                # each chip forwards only its ceil(T/n) tiles per frame
                return b * math.ceil(n_tiles / self.n_shards)
            b *= n_tiles
        if self.n_shards > 1:
            if self.shard == "batch":
                b = math.ceil(b / self.n_shards)
            elif self.shard == "spatial":
                # whole frames with H sharded over the mesh: each chip
                # computes 1/n of every frame's rows, so MXU fill per
                # chip scales like a 1/n-size batch
                b = max(math.ceil(b / self.n_shards), 1)
        return b

    def _dispatch_geometry(self, frames: np.ndarray):
        """(batch_dim, elem_pixels) of the per-chip dispatched program —
        the two measured axes of the int8/bf16 crossover. batch_dim is
        the LITERAL batch dimension the convolutions see (frames,
        tiles, or the per-chip frame share under batch sharding — under
        spatial sharding the batch dim survives intact and only rows
        split); elem_pixels is the spatial extent each batch element
        carries (padded frame, tile, or H-shard)."""
        b, h, w, _ = frames.shape
        if self.tile_size and max(h, w) > self.tile_threshold:
            t = self.tile_size
            n_tiles = math.ceil(h / t) * math.ceil(w / t)
            if self.shard == "spatial" and self.n_shards > 1:
                # the tile dim shards over the mesh
                bd = b * math.ceil(n_tiles / self.n_shards)
            elif self.n_shards > 1 and self.shard == "batch":
                bd = math.ceil(b * n_tiles / self.n_shards)
            else:
                bd = b * n_tiles
            return bd, t * t
        hb = self.bucket
        if self.shard == "spatial":
            hb = math.lcm(self.bucket, self.n_shards)
        bh = math.ceil(h / hb) * hb
        bw = math.ceil(w / self.bucket) * self.bucket
        if self.n_shards > 1:
            if self.shard == "batch":
                b = math.ceil(b / self.n_shards)
            else:  # spatial: batch dim intact, each chip gets 1/n rows
                bh = math.ceil(bh / self.n_shards)
        return b, bh * bw

    def _prefers_int8(self, frames: np.ndarray) -> bool:
        """The auto-precision decision for this dispatch. Default: the
        measured law — int8 once the dispatch clears the global batch/
        per-element-pixel floors AND the graph's own per-family batch
        floor (`int8_min_batch`: 8 for the CCTrans ViT, whose int8
        graph measured 0.68x bf16 at B=1 while every conv family wins
        there — nn/quant.py::build_quantized). Explicit int
        auto_threshold: legacy per-chip-batch rule."""
        if self.auto_threshold is not None:
            return self._dispatch_batch(frames) >= self.auto_threshold
        bd, epx = self._dispatch_geometry(frames)
        min_bd = max(AUTO_INT8_MIN_BATCH, self._family_min_batch())
        return bd >= min_bd and epx >= AUTO_INT8_MIN_PIXELS

    def _family_min_batch(self) -> int:
        """Pre-calibration the graph attr doesn't exist yet, so derive
        the family floor from the model class too — a latency-regime
        CCTrans stream must not pay fold+calibrate for a graph the
        rule would never dispatch."""
        if self.quantized is not None:
            return getattr(self.quantized, "int8_min_batch", 1)
        from dgvcc_tpu.models.baselines.cctrans import ALTGVT

        return 8 if isinstance(self.model, ALTGVT) else 1

    def _select(self, frames: np.ndarray):
        """(infer, infer_tiled, weights) for this dispatch. Non-auto:
        the constructor precision. Auto: int8 once calibrated AND the
        dispatch clears the crossover rule (_prefers_int8), else fp."""
        use_q = self.quantized is not None and (
            not self.auto or self._prefers_int8(frames))
        # best-effort observability (exact under serve_http's single
        # dispatcher thread); surfaced as dispatch_fp/dispatch_int8 in
        # /stats and aggregated fleet-wide
        self.dispatches["int8" if use_q else "fp"] += 1
        if use_q:
            return self._infer_q, self._infer_tiled_q, self.quantized.qparams
        return self._infer_fp, self._infer_tiled_fp, self.variables

    def _maybe_calibrate(self, frames: np.ndarray):
        """Lazy PTQ calibration. In auto mode, don't pay fold+calibrate
        for a latency-regime stream that would never dispatch int8."""
        if not self._quant_pending:
            return
        if self.auto and not self._prefers_int8(frames):
            return
        self._build_quantized(frames)

    @classmethod
    def from_checkpoint(cls, model_name: str, ckpt_path: Optional[str] = None,
                        log_para: float = 1000.0, dtype=jnp.bfloat16,
                        quantize=False,
                        calib_frames: Optional[np.ndarray] = None,
                        tile_size: int = 768, tile_threshold: int = 4096,
                        mesh=None, shard: str = "batch", bucket: int = 64,
                        auto_threshold: Optional[int] = None,
                        **model_params):
        import dgvcc_tpu.models  # noqa: F401

        model = MODELS.build(model_name, dtype=dtype, **model_params)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 256, 256, 3), dtype),
        )
        if ckpt_path and str(ckpt_path).endswith((".pth", ".pt")):
            # trained reference checkpoint (torch state_dict) — convert
            from flax.core import unfreeze

            from dgvcc_tpu.nn.torch_io import (
                load_reference_checkpoint, load_torch_state_dict)

            variables = load_reference_checkpoint(
                {"params": unfreeze(variables["params"]),
                 "batch_stats": unfreeze(variables.get("batch_stats", {}))},
                load_torch_state_dict(ckpt_path), model)
        elif ckpt_path:
            # reuse the trainer's non-strict merge: matching subtrees
            # restore, mismatches warn instead of failing opaquely later
            from flax import serialization
            from flax.core import unfreeze

            from dgvcc_tpu.train.checkpoint import _merge_nonstrict

            with open(ckpt_path, "rb") as f:
                loaded = serialization.msgpack_restore(f.read())
            warnings: list = []
            # serve the EMA shadow when the run kept one (`ema:` config)
            # — deployment is exactly what the averaged weights are for
            src = loaded.get("ema_params") or loaded.get("params", {})
            if "ema_params" in loaded:
                print("[serve ckpt] using EMA-averaged weights")
            variables = {
                "params": _merge_nonstrict(unfreeze(variables["params"]),
                                           src,
                                           "params", warnings),
                "batch_stats": _merge_nonstrict(
                    unfreeze(variables.get("batch_stats", {})),
                    loaded.get("batch_stats", {}), "batch_stats", warnings),
            }
            for w in warnings[:10]:
                print(f"[serve ckpt] {w}")
        # push weights to the device ONCE — numpy inputs would be
        # re-transferred on every inference call (replicated across the
        # mesh when serving data-parallel)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        else:
            variables = jax.device_put(variables)
        return cls(model, variables, log_para=log_para, dtype=dtype,
                   quantize=quantize, calib_frames=calib_frames,
                   tile_size=tile_size, tile_threshold=tile_threshold,
                   mesh=mesh, shard=shard, bucket=bucket,
                   auto_threshold=auto_threshold)

    @classmethod
    def from_artifact(cls, path: str, log_para: float = 1000.0,
                      dtype=None, tile_size: int = 768,
                      tile_threshold: int = 4096, mesh=None,
                      shard: str = "batch"):
        """Serve from a saved int8 artifact (nn/quant_io.py): no
        checkpoint, no calibration frames, no fp forward at startup —
        the deploy path for replicas. ``dtype`` overrides the stored
        serving dtype (e.g. float32 on CPU)."""
        from dgvcc_tpu.nn.quant_io import load_quantized

        art = load_quantized(path, dtype=dtype)
        return cls(art.model, None, log_para=log_para,
                   dtype=art.quantized.dtype, tile_size=tile_size,
                   tile_threshold=tile_threshold, mesh=mesh, shard=shard,
                   quantized=art.quantized)

    def _pad(self, frames: np.ndarray):
        b, h, w, c = frames.shape
        hb = self.bucket
        if self.shard == "spatial":
            # the H dim shards over the mesh: jit in_shardings demand
            # divisibility, so round the bucket up to cover the axis
            # size (the valid_hw mask zeroes the extra rows' counts)
            hb = math.lcm(self.bucket, self.n_shards)
        bh = math.ceil(h / hb) * hb
        bw = math.ceil(w / self.bucket) * self.bucket
        if (bh, bw) == (h, w):
            return frames, (h, w)
        out = np.zeros((b, bh, bw, c), frames.dtype)
        out[:, :h, :w] = frames
        return out, (h, w)

    def _tile(self, frames: np.ndarray):
        """(B, H, W, 3) → (B, T, t, t, 3) tiles + (B*T, 2) per-tile
        valid extents. One compiled program per (B, T) — for a video
        stream (constant frame size) that is a single program, with
        tile compute instead of a monolithic multi-megapixel forward."""
        b, h, w, c = frames.shape
        t = self.tile_size
        nh, nw = math.ceil(h / t), math.ceil(w / t)
        padded = np.zeros((b, nh * t, nw * t, c), frames.dtype)
        padded[:, :h, :w] = frames
        tiles = (padded.reshape(b, nh, t, nw, t, c)
                 .transpose(0, 1, 3, 2, 4, 5)
                 .reshape(b, nh * nw, t, t, c))
        vh = np.clip(h - np.arange(nh) * t, 0, t)
        vw = np.clip(w - np.arange(nw) * t, 0, t)
        valid = np.stack(np.broadcast_arrays(vh[:, None], vw[None, :]),
                         axis=-1).reshape(nh * nw, 2)
        return tiles, np.tile(valid, (b, 1)).astype(np.int32)

    def _launch(self, frames: np.ndarray):
        """Dispatch one batch; returns a (B,) device-array future."""
        b = frames.shape[0]
        if self.n_shards > 1 and self.shard == "batch" and b % self.n_shards:
            # batch dim shards over the mesh — pad with zero frames and
            # drop their counts (lazy slice keeps this a device future)
            extra = self.n_shards - b % self.n_shards
            frames = np.concatenate(
                [frames, np.zeros((extra,) + frames.shape[1:], frames.dtype)])
        out = self._launch_exact(frames)
        return out[:b] if frames.shape[0] != b else out

    def _launch_exact(self, frames: np.ndarray):
        b, h, w, _ = frames.shape
        if self.tile_size and max(h, w) > self.tile_threshold:
            tiles, valid = self._tile(frames)
            if self.shard == "spatial" and tiles.shape[1] % self.n_shards:
                # the tile dim shards over the mesh — pad each frame's
                # tile list to the axis size with zero tiles whose zero
                # valid extents mask their counts out of the sums
                t = tiles.shape[1]
                extra = self.n_shards - t % self.n_shards
                tiles = np.concatenate(
                    [tiles, np.zeros((b, extra) + tiles.shape[2:],
                                     tiles.dtype)], axis=1)
                valid = np.concatenate(
                    [valid.reshape(b, t, 2),
                     np.zeros((b, extra, 2), valid.dtype)],
                    axis=1).reshape(b * (t + extra), 2)
            _, infer_tiled, weights = self._select(frames)
            return infer_tiled(weights, jnp.asarray(tiles),
                               jnp.asarray(valid))
        infer, _, weights = self._select(frames)
        padded, (h, w) = self._pad(frames)
        valid = np.tile(np.int32([h, w]), (b, 1))
        return infer(weights, jnp.asarray(padded), jnp.asarray(valid))

    def count_frames(self, frames: np.ndarray) -> np.ndarray:
        """frames: (B, H, W, 3) uint8 → (B,) predicted counts."""
        frames = np.asarray(frames)
        self._maybe_calibrate(frames)  # lazy PTQ on the first real batch
        return np.asarray(self._launch(frames))

    def stream(self, frame_batches: Iterable[np.ndarray],
               prefetch: int = 2) -> Iterator[np.ndarray]:
        """Pipelined streaming: keeps `prefetch` device batches in flight
        so host decode overlaps TPU compute."""
        in_flight = []
        for frames in frame_batches:
            frames = np.asarray(frames)
            self._maybe_calibrate(frames)
            in_flight.append(self._launch(frames))
            if len(in_flight) > prefetch:
                yield np.asarray(in_flight.pop(0))
        for fut in in_flight:
            yield np.asarray(fut)
