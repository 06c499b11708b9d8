"""Serving path + on-device augmentation pipeline."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _write_tiny_cfg(tmp_path):
    """Minimal serving config for _build_counter (no datasets needed)."""
    import yaml

    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump({
        "seed": 0, "version": "t", "device": "tpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "base", "params": {"pretrained": False}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }))
    return str(p)


def test_video_counter_counts_uint8_frames():
    from dgvcc_tpu.serve import VideoCounter

    counter = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 100, 140, 3), dtype=np.uint8)
    counts = counter.count_frames(frames)
    assert counts.shape == (2,)
    assert np.isfinite(counts).all() and (counts >= 0).all()
    # deterministic across calls
    counts2 = counter.count_frames(frames)
    np.testing.assert_allclose(counts, counts2, rtol=1e-6)


def test_video_counter_quantized_tracks_fp():
    """quantize=True serves through the int8 PTQ graph (nn/quant.py):
    counts must track the fp path within quantization tolerance and be
    deterministic."""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    fp = VideoCounter.from_checkpoint("final", None, dtype=jnp.float32,
                                      mem_size=8, mem_dim=16)
    q = VideoCounter.from_checkpoint("final", None, dtype=jnp.float32,
                                     quantize=True, calib_frames=frames,
                                     mem_size=8, mem_dim=16)
    assert q.quantized is not None
    c_fp = fp.count_frames(frames)
    c_q = q.count_frames(frames)
    assert np.isfinite(c_q).all()
    np.testing.assert_allclose(c_q, c_fp,
                               rtol=0.05, atol=0.05 * max(1.0, abs(c_fp).max()))
    np.testing.assert_allclose(c_q, q.count_frames(frames), rtol=1e-6)


def test_video_counter_stream_order():
    from dgvcc_tpu.serve import VideoCounter

    counter = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    batches = [rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
               for _ in range(5)]
    streamed = list(counter.stream(iter(batches), prefetch=2))
    assert len(streamed) == 5
    direct = [counter.count_frames(b) for b in batches]
    for s, d in zip(streamed, direct):
        np.testing.assert_allclose(s, d, rtol=1e-6)


def test_device_augmentation_batch():
    from dgvcc_tpu.data.device_pipeline import augment_two_view_batch

    rng = np.random.default_rng(2)
    B, H, W, crop = 4, 96, 128, 64
    frames = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    dmaps = rng.uniform(0, 0.1, (B, H, W, 1)).astype(np.float32)

    out = augment_two_view_batch(jnp.asarray(frames), jnp.asarray(dmaps),
                                 jax.random.PRNGKey(0), crop=crop)
    assert out["img1"].shape == (B, crop, crop, 3)
    assert out["img2"].shape == (B, crop, crop, 3)
    assert out["dmap"].shape == (B, crop, crop, 1)
    assert out["bmap"].shape == (B, crop // 16, crop // 16, 1)
    # normalized range
    assert float(out["img1"].min()) >= -1.0 and float(out["img1"].max()) <= 1.0
    # views share geometry: both derived from the same crop ⇒ dmap/bmap
    # consistent
    d = np.asarray(out["dmap"])[..., 0]
    blocks = d.reshape(B, crop // 16, 16, crop // 16, 16).sum(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(out["bmap"])[..., 0],
                                  (blocks > 0).astype(np.float32))
    # different keys → different crops
    out2 = augment_two_view_batch(jnp.asarray(frames), jnp.asarray(dmaps),
                                  jax.random.PRNGKey(1), crop=crop)
    assert not np.allclose(np.asarray(out["img1"]), np.asarray(out2["img1"]))


def test_device_photometric_ops_match_host_semantics():
    """Spot-check brightness/saturation against PIL ImageEnhance."""
    from PIL import Image, ImageEnhance
    from dgvcc_tpu.data.device_pipeline import adjust_brightness, adjust_saturation

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    x = jnp.asarray(img, jnp.float32) / 255.0

    ours = np.asarray(jnp.clip(adjust_brightness(x, 1.3), 0, 1)) * 255
    golden = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(1.3))
    assert np.abs(ours - golden).max() <= 1.0  # uint8 rounding

    ours = np.asarray(jnp.clip(adjust_saturation(x, 0.7), 0, 1)) * 255
    golden = np.asarray(ImageEnhance.Color(Image.fromarray(img)).enhance(0.7))
    assert np.abs(ours - golden).max() <= 2.0


def test_raw_crop_dataset(tmp_path):
    import random
    from PIL import Image
    from dgvcc_tpu.core.registry import DATASETS
    import dgvcc_tpu.data  # noqa: F401
    from dgvcc_tpu.data.datasets import RawCropDataset
    from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np

    rng = np.random.default_rng(0)
    d = tmp_path / "train"
    d.mkdir()
    for k in range(2):
        h, w = 100, 120
        Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
            d / f"i{k}.jpg")
        pts = rng.uniform(0, [w, h], (5, 2)).astype(np.float32)
        np.save(d / f"i{k}.npy", pts)
        np.save(d / f"i{k}_dmap.npy", gaussian_density_fixed_np((h, w), pts))

    base = DATASETS.build("den", root=str(tmp_path), crop_size=64, downsample=1,
                          method="train", unit_size=16)
    ds = RawCropDataset(base, pre_crop=96)
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s["frames_u8"].shape == (96, 96, 3) and s["frames_u8"].dtype == np.uint8
    assert s["dmaps"].shape == (96, 96, 1)
    b = RawCropDataset.collate([s, ds.__getitem__(1, rng=random.Random(1))])
    assert b["frames_u8"].shape == (2, 96, 96, 3)

    # pre_crop larger than the image → padded
    ds2 = RawCropDataset(base, pre_crop=160)
    s2 = ds2.__getitem__(0, rng=random.Random(0))
    assert s2["frames_u8"].shape == (160, 160, 3)


def test_cli_serve_task(tmp_path, capsys):
    """--task serve: per-frame counts + fps summary over an image dir,
    with mixed frame shapes flushing into separate compile buckets."""
    import yaml
    from PIL import Image

    from dgvcc_tpu.cli.main import run

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(3)
    for i, (h, w) in enumerate([(64, 64), (64, 64), (64, 96)]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(frames / f"f{i}.jpg")

    cfg = {
        "seed": 0, "version": "serve_t", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "base", "params": {"pretrained": False}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    run(str(p), "serve", frames=str(frames), batch=2)
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("f")]
    assert len(lines) == 3 and all(len(ln.split()) == 2 for ln in lines)
    assert "[serve] 3 frames" in out

    # --quantize serves the same frames through the int8 PTQ graph
    # (calibrated on the first real frames) and still emits every count
    run(str(p), "serve", frames=str(frames), batch=2, quantize=True)
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("f")]
    assert len(lines) == 3 and all(np.isfinite(float(ln.split()[1]))
                                   for ln in lines)


@pytest.mark.parametrize("name", ["csrnet", "mcnn", "bl"])
def test_video_counter_quantized_baselines(name):
    """quantize=True now covers the conv(+BN) baselines through the
    generic QuantizedConvNet path (nn/quant.py, round 3)."""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    fp = VideoCounter.from_checkpoint(name, None, dtype=jnp.float32)
    q = VideoCounter.from_checkpoint(name, None, dtype=jnp.float32,
                                     quantize=True, calib_frames=frames)
    assert q.quantized is not None
    c_fp = fp.count_frames(frames)
    c_q = q.count_frames(frames)
    assert np.isfinite(c_q).all()
    np.testing.assert_allclose(c_q, c_fp,
                               rtol=0.05, atol=0.05 * max(1.0, abs(c_fp).max()))


def test_video_counter_quantize_rejects_whitening():
    from dgvcc_tpu.serve import VideoCounter

    with pytest.raises(ValueError, match="quantize=True supports"):
        VideoCounter.from_checkpoint("sw", None, quantize=True,
                                     layers=(1, 1, 1))


def test_video_counter_tiled_large_frames():
    """Frames above tile_threshold route through the tiled path: same
    fused uint8 graph over a (B, T, t, t, 3) tile batch. Counts track
    the whole-frame path (boundary-conv differences only) and padded
    tile borders contribute zero."""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (2, 100, 150, 3), dtype=np.uint8)

    whole = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                         tile_size=0)
    tiled = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                         tile_size=64, tile_threshold=96)
    c_whole = whole.count_frames(frames)
    c_tiled = tiled.count_frames(frames)
    assert np.isfinite(c_tiled).all()
    # tile-border conv halos only — counts agree to a few percent
    np.testing.assert_allclose(c_tiled, c_whole, rtol=0.1,
                               atol=0.1 * max(1.0, np.abs(c_whole).max()))
    # deterministic
    np.testing.assert_allclose(c_tiled, tiled.count_frames(frames),
                               rtol=1e-6)
    # grid independence: a different tile size pads the grid
    # differently; the per-tile valid masks must zero all of it, so the
    # counts agree up to boundary-conv halos
    g96 = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                       tile_size=96, tile_threshold=96)
    c_96 = g96.count_frames(frames)
    np.testing.assert_allclose(c_96, c_tiled, rtol=0.1,
                               atol=0.1 * max(1.0, np.abs(c_tiled).max()))


def test_video_counter_auto_precision_picks_graph_by_batch():
    """quantize='auto': fp graph below auto_threshold per-chip batch,
    int8 at/above it; both give the same counts within PTQ tolerance.
    (Measured basis: int8 wins >=B=8/chip, bf16 wins at B=1 —
    BENCH_NOTES round 4.)"""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(5)
    calib = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    vc = VideoCounter.from_checkpoint("final", None, dtype=jnp.float32,
                                      quantize="auto", calib_frames=calib,
                                      auto_threshold=4,
                                      mem_size=8, mem_dim=16)
    assert vc.quantized is not None and vc.auto

    calls = {"fp": 0, "q": 0}
    fp, q = vc._infer_fp, vc._infer_q

    def spy(name, fn):
        def wrapped(*a):
            calls[name] += 1
            return fn(*a)
        return wrapped

    vc._infer_fp, vc._infer_q = spy("fp", fp), spy("q", q)

    small = rng.integers(0, 256, (1, 96, 128, 3), dtype=np.uint8)
    big = np.tile(small, (4, 1, 1, 1))
    c_small = vc.count_frames(small)
    assert calls == {"fp": 1, "q": 0}
    c_big = vc.count_frames(big)
    assert calls == {"fp": 1, "q": 1}
    # same frame, both precisions: counts agree within PTQ tolerance
    np.testing.assert_allclose(
        c_big[0], c_small[0], rtol=0.05,
        atol=0.05 * max(1.0, abs(float(c_small[0]))))


def test_video_counter_auto_lazy_calibration_waits_for_throughput_batch():
    """auto without calib_frames serves fp immediately and only pays
    fold+calibrate when a batch first reaches the threshold."""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(6)
    vc = VideoCounter.from_checkpoint("final", None, dtype=jnp.float32,
                                      quantize="auto", auto_threshold=4,
                                      mem_size=8, mem_dim=16)
    assert vc._quant_pending and vc.quantized is None

    small = rng.integers(0, 256, (1, 96, 128, 3), dtype=np.uint8)
    c1 = vc.count_frames(small)
    assert vc.quantized is None  # latency regime: no calibration cost
    assert np.isfinite(c1).all()

    big = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    c4 = vc.count_frames(big)
    assert vc.quantized is not None and not vc._quant_pending
    assert np.isfinite(c4).all()


def test_video_counter_auto_rejects_artifact_serving():
    """an int8 artifact has no fp weights — auto must refuse loudly."""
    from dgvcc_tpu.serve import VideoCounter
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401

    model = MODELS.build("base", dtype=jnp.float32)
    with pytest.raises(ValueError, match="auto"):
        VideoCounter(model, None, quantize="auto")


def test_video_counter_auto_selection_logic():
    """Fast-lane sibling of the heavy auto-precision tests: the
    dispatch-batch accounting and graph selection, no quantize build."""
    from dgvcc_tpu.serve import VideoCounter

    vc = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                      quantize="auto", auto_threshold=4,
                                      tile_size=64, tile_threshold=96)
    small = np.zeros((1, 64, 64, 3), np.uint8)
    big = np.zeros((4, 64, 64, 3), np.uint8)
    # calibration still pending: fp serves every batch
    assert vc._select(small)[0] is vc._infer_fp
    assert vc._select(big)[0] is vc._infer_fp

    class FakeQ:
        qparams = {"sites": {}}

    vc.quantized, vc._quant_pending = FakeQ(), False
    assert vc._select(small)[0] is vc._infer_fp
    assert vc._select(big)[0] is vc._infer_q
    # the tiled path inflates the dispatch batch: one 300x300 frame cuts
    # into 25 tiles >= threshold -> int8
    giant = np.zeros((1, 300, 300, 3), np.uint8)
    assert vc._dispatch_batch(giant) == 25
    assert vc._select(giant)[1] is vc._infer_tiled_q
    # non-auto counters keep constructor precision regardless of batch
    vc.auto = False
    assert vc._select(small)[0] is vc._infer_q


def test_auto_precision_default_rule_matches_measured_crossover():
    """Default auto rule (auto_threshold=None) applies the measured
    round-5 crossover law: after the memory-attention batch-routing fix
    the selective-int8 graph won at EVERY measured shape x batch point
    (BENCH_NOTES round-5 crossover), so the default serves int8
    whenever the quantized graph exists. The _dispatch_geometry
    accounting stays load-bearing (it feeds the thresholds, which a
    future recalibration or an operator auto_threshold can tighten)."""
    from dgvcc_tpu.serve import (AUTO_INT8_MIN_BATCH,
                                 AUTO_INT8_MIN_PIXELS, VideoCounter)

    vc = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                      quantize="auto")
    assert vc.auto_threshold is None

    class FakeQ:
        qparams = {"sites": {}}

    # uncalibrated: fp serves everything regardless of the rule
    b1 = np.zeros((1, 768, 1024, 3), np.uint8)
    assert vc._select(b1)[0] is vc._infer_fp

    vc.quantized, vc._quant_pending = FakeQ(), False

    # measured law: int8 wins at every >=256^2 point incl. B=1 (1.19x
    # at 768x1024); elements under the 256^2 floor stay bf16 (the tail
    # is chaotic: 128^2 int8 loses 2.6x at B=4, wins 2.3x at B=8 —
    # sub-ms dispatches either way, so the rule avoids the loss)
    b4 = np.zeros((4, 768, 1024, 3), np.uint8)
    giant = np.zeros((1, 1088, 1920, 3), np.uint8)
    small = np.zeros((4, 256, 256, 3), np.uint8)
    tiny = np.zeros((8, 128, 128, 3), np.uint8)
    for frames in (b1, b4, giant, small):
        assert vc._prefers_int8(frames)
    assert not vc._prefers_int8(tiny)
    assert vc._select(b1)[0] is vc._infer_q
    assert (AUTO_INT8_MIN_BATCH, AUTO_INT8_MIN_PIXELS) == (1, 65_536)

    # geometry accounting: batch dim + per-element pixels
    assert vc._dispatch_geometry(b1) == (1, 768 * 1024)
    # padding rounds UP to the bucket: 1 x 1000x1990 pads to 1024x2048
    ragged = np.zeros((1, 1000, 1990, 3), np.uint8)
    assert vc._dispatch_geometry(ragged) == (1, 1024 * 2048)

    # batch sharding divides the batch dim: 4 frames over 8 chips
    vc.n_shards, vc.shard = 8, "batch"
    assert vc._dispatch_geometry(b4) == (1, 768 * 1024)
    # spatial sharding keeps the batch dim intact (only rows split)
    vc.shard = "spatial"
    b8 = np.zeros((8, 768, 1024, 3), np.uint8)
    assert vc._dispatch_geometry(b8) == (8, (768 // 8) * 1024)

    # tiled path: tiles ARE the batch dim, each tile is one element
    vc.n_shards, vc.shard = 1, "batch"
    vc.tile_size, vc.tile_threshold = 64, 96
    t25 = np.zeros((1, 300, 300, 3), np.uint8)  # 25 tiles of 64^2
    assert vc._dispatch_geometry(t25) == (25, 64 * 64)

    # an explicit integer auto_threshold restores a batch-based rule
    vc.auto_threshold, vc.tile_size = 4, 0
    assert not vc._prefers_int8(b1)
    assert vc._select(b1)[0] is vc._infer_fp
    assert vc._prefers_int8(b8)


def test_dispatch_batch_accounts_for_mesh_sharding():
    """The auto threshold compares PER-CHIP batch: both shard modes
    divide the dispatch over the mesh (regression: spatial used to
    report the global tile count, over-triggering int8 by n_shards)."""
    from dgvcc_tpu.serve import VideoCounter

    vc = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                      quantize="auto", auto_threshold=4,
                                      tile_size=64, tile_threshold=96)
    giant = np.zeros((1, 300, 300, 3), np.uint8)   # 25 tiles
    frames4 = np.zeros((4, 64, 64, 3), np.uint8)   # whole frames

    # single device: tiled inflation counts in full
    assert vc._dispatch_batch(giant) == 25

    # pretend an 8-chip mesh without building one (accounting only)
    vc.n_shards = 8
    vc.shard = "spatial"
    # tile dim shards over the mesh: ceil(25/8) = 4 tiles/chip
    assert vc._dispatch_batch(giant) == 4
    # whole frames, H sharded: per-chip fill ~ b/n -> 1
    assert vc._dispatch_batch(frames4) == 1

    vc.shard = "batch"
    assert vc._dispatch_batch(giant) == math.ceil(25 / 8)
    assert vc._dispatch_batch(frames4) == 1


def test_auto_counter_pins_fp_graphs_and_rejects_aot_export():
    """quantize='auto' has no single pinned precision: the pinned
    `_infer` pair and `_weights()` must stay fp-consistent even after
    calibration, and AOT export must refuse the counter loudly."""
    from dgvcc_tpu.nn.aot import export_serving
    from dgvcc_tpu.serve import VideoCounter

    vc = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                      quantize="auto")
    assert vc._infer is vc._infer_fp and vc._infer_tiled is vc._infer_tiled_fp
    assert vc._weights() is vc.variables

    class FakeQ:
        qparams = {"sites": {}}

    vc.quantized, vc._quant_pending = FakeQ(), False
    # even once calibrated: the pinned pair is for export/lowering and
    # must agree with _weights() (live dispatch goes through _select)
    assert vc._weights() is vc.variables
    with pytest.raises(ValueError, match="auto"):
        export_serving(vc, shapes=[(1, 64, 64)])


def test_cli_serve_rejects_artifact_with_auto(tmp_path):
    """--quantize auto + --artifact must fail loudly up front (the
    artifact has no fp weights for the small-batch path)."""
    from dgvcc_tpu.cli.main import _build_counter
    from dgvcc_tpu.core.config import load_config

    cfg = load_config(_write_tiny_cfg(tmp_path))
    with pytest.raises(SystemExit, match="auto"):
        _build_counter(cfg, quantize="auto", artifact="whatever.npz")


def test_auto_precision_family_floor_cctrans():
    """The ViT's int8 graph loses at B=1 (0.68x measured) while every
    conv family wins there — build_quantized attaches int8_min_batch=8
    to CCTrans graphs and auto honors it pre- and post-calibration."""
    from dgvcc_tpu.serve import VideoCounter

    vc = VideoCounter.from_checkpoint(
        "cctrans", None, dtype=jnp.float32, quantize="auto",
        embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 4, 8),
        depths=(1, 1, 1, 1), wss=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1))
    b1 = np.zeros((1, 768, 1024, 3), np.uint8)
    b8 = np.zeros((8, 768, 1024, 3), np.uint8)
    # pre-calibration: the family floor comes from the model class, so
    # a B=1 stream never pays fold+calibrate
    assert vc._family_min_batch() == 8
    assert not vc._prefers_int8(b1)
    assert vc._prefers_int8(b8)
    vc._maybe_calibrate(b1)
    assert vc.quantized is None  # calibration correctly deferred

    class FakeQ:
        qparams = {"sites": {}}
        int8_min_batch = 8

    vc.quantized, vc._quant_pending = FakeQ(), False
    assert not vc._prefers_int8(b1)   # post-calibration: graph attr
    assert vc._select(b1)[0] is vc._infer_fp
    assert vc._select(b8)[0] is vc._infer_q


def test_build_quantized_attaches_cctrans_batch_floor(tmp_path):
    """build_quantized marks ALTGVT graphs int8_min_batch=8; conv
    families keep the default."""
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.quant import build_quantized

    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)

    m = MODELS.build("cctrans", dtype=jnp.float32,
                     embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 4, 8),
                     depths=(1, 1, 1, 1), wss=(2, 2, 2, 2),
                     sr_ratios=(8, 4, 2, 1))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 64, 64, 3), jnp.float32))
    q = build_quantized(m, v, calib, dtype=jnp.float32)
    assert getattr(q, "int8_min_batch", 1) == 8

    m2 = MODELS.build("mcnn", dtype=jnp.float32)
    v2 = m2.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    q2 = build_quantized(m2, v2, calib, dtype=jnp.float32)
    assert getattr(q2, "int8_min_batch", 1) == 1
