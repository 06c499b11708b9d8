"""AOT serving artifacts (nn/aot.py): serialized StableHLO programs.

The exported program must reproduce the live VideoCounter bit-for-bit
(same traced graph, same XLA), survive a file roundtrip, lower for
multiple platforms from one host, and dispatch padded/chunked batches
exactly like live serving.
"""

import numpy as np
import pytest
import jax.numpy as jnp


def _mcnn_counter():
    from dgvcc_tpu.serve import VideoCounter

    return VideoCounter.from_checkpoint("mcnn", None, dtype=jnp.float32)


def test_aot_roundtrip_matches_live(tmp_path):
    from dgvcc_tpu.nn.aot import AotCounter, export_serving, save_aot

    counter = _mcnn_counter()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 100, 140, 3), dtype=np.uint8)
    live = counter.count_frames(frames)

    doc = export_serving(counter, [(2, 100, 140), (2, 64, 64)])
    path = str(tmp_path / "mcnn.aot")
    save_aot(doc, path)
    aot = AotCounter.load(path)
    assert aot.quantized is None

    # exact: the exported program IS the live program
    np.testing.assert_allclose(aot.count_frames(frames), live, rtol=1e-6)
    # a smaller batch pads into the B=2 program, padding masked out
    np.testing.assert_allclose(aot.count_frames(frames[:1]), live[:1],
                               rtol=1e-6)
    # a larger batch chunks through the exported batch size
    f5 = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(aot.count_frames(f5),
                               counter.count_frames(f5), rtol=1e-6)
    # streaming preserves order and values
    batches = [rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
               for _ in range(3)]
    streamed = np.concatenate(list(aot.stream(iter(batches), prefetch=1)))
    direct = np.concatenate([counter.count_frames(b) for b in batches])
    np.testing.assert_allclose(streamed, direct, rtol=1e-6)


def test_aot_multiplatform_lowering(tmp_path):
    """One artifact lowered for tpu AND cpu from this (CPU) host — the
    build-here-deploy-there story — still runs on the cpu leg."""
    from dgvcc_tpu.nn.aot import AotCounter, export_serving, save_aot

    counter = _mcnn_counter()
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)

    doc = export_serving(counter, [(1, 64, 64)], platforms=["tpu", "cpu"])
    assert doc["platforms"] == ["tpu", "cpu"]
    path = str(tmp_path / "multi.aot")
    save_aot(doc, path)
    aot = AotCounter.load(path)
    np.testing.assert_allclose(aot.count_frames(frames),
                               counter.count_frames(frames), rtol=1e-6)


def test_aot_wrong_platform_rejected(tmp_path):
    from dgvcc_tpu.nn.aot import AotCounter, export_serving, save_aot

    counter = _mcnn_counter()
    doc = export_serving(counter, [(1, 64, 64)], platforms=["tpu"])
    path = str(tmp_path / "tpu_only.aot")
    save_aot(doc, path)
    with pytest.raises(ValueError, match="lowered for"):
        AotCounter.load(path)


def test_aot_unseen_shape_errors_with_inventory(tmp_path):
    from dgvcc_tpu.nn.aot import AotCounter, export_serving, save_aot

    counter = _mcnn_counter()
    doc = export_serving(counter, [(1, 64, 64)])
    path = str(tmp_path / "one.aot")
    save_aot(doc, path)
    aot = AotCounter.load(path)
    with pytest.raises(ValueError, match="no exported program"):
        aot.count_frames(np.zeros((1, 256, 256, 3), np.uint8))


def test_aot_rejects_mesh_and_pending_quant():
    from dgvcc_tpu.nn.aot import export_serving
    from dgvcc_tpu.serve import VideoCounter

    q = VideoCounter.from_checkpoint("mcnn", None, dtype=jnp.float32,
                                     quantize=True)  # lazy, uncalibrated
    with pytest.raises(ValueError, match="uncalibrated"):
        export_serving(q, [(1, 64, 64)])


def test_aot_quantized_dg_roundtrip(tmp_path):
    """AOT of an int8-quantized DG serving graph: the artifact is a
    self-contained int8 program (weights = qparams as inputs)."""
    from dgvcc_tpu.nn.aot import AotCounter, export_serving, save_aot
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    q = VideoCounter.from_checkpoint("final", None, dtype=jnp.float32,
                                     quantize=True, calib_frames=frames,
                                     mem_size=8, mem_dim=16)
    live = q.count_frames(frames)
    path = str(tmp_path / "dg_int8.aot")
    save_aot(export_serving(q, [(2, 96, 128)]), path)
    aot = AotCounter.load(path)
    assert aot.quantized is True
    np.testing.assert_allclose(aot.count_frames(frames), live, rtol=1e-6)


def test_cli_aot_then_serve(tmp_path, capsys):
    """--task aot writes the artifact; --task serve --aot replays it
    (no checkpoint, no model build) with counts matching live serving."""
    import yaml
    from flax import serialization
    from flax.core import unfreeze
    from PIL import Image

    import jax
    from dgvcc_tpu.cli.main import run
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401

    # a real (random-init) checkpoint file for the mcnn model
    model = MODELS.build("mcnn", dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    ckpt = tmp_path / "mcnn.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"params": unfreeze(variables["params"]),
         "batch_stats": unfreeze(variables.get("batch_stats", {}))}))

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(frames / f"f{i}.png")

    cfg = {
        "seed": 0, "version": "aot_t", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": str(ckpt),
        "model": {"name": "mcnn", "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    out_path = str(tmp_path / "mcnn_cli.aot")
    run(str(p), "aot", shapes="2x64x64", out=out_path)
    assert "wrote" in capsys.readouterr().out

    run(str(p), "serve", frames=str(frames), batch=2, aot=out_path)
    aot_out = capsys.readouterr().out
    lines = [ln for ln in aot_out.splitlines() if ln.startswith("f")]
    assert len(lines) == 3

    # counts equal the live (checkpoint) serving path
    run(str(p), "serve", frames=str(frames), batch=2)
    live_out = capsys.readouterr().out
    live = [float(ln.split()[1]) for ln in live_out.splitlines()
            if ln.startswith("f")]
    got = [float(ln.split()[1]) for ln in lines]
    np.testing.assert_allclose(got, live, rtol=1e-5)
