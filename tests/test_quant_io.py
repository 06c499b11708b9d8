"""Persisted int8 serving artifacts (nn/quant_io.py).

A saved artifact must rebuild the EXACT serving graph — same int8
weights, same scales, same fp sites — so load-vs-build outputs are
bit-identical, and serving a replica needs neither the checkpoint nor
calibration imagery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgvcc_tpu.models  # noqa: F401
from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.quant import build_quantized
from dgvcc_tpu.nn.quant_io import load_quantized, save_quantized


def _init_vars(model, x, dropout=True):
    rngs = {"params": jax.random.PRNGKey(0)}
    if dropout:
        rngs["dropout"] = jax.random.PRNGKey(1)
    return model.init(rngs, x)


def test_dg_artifact_roundtrip(tmp_path):
    model = MODELS.build("final", mem_size=8, mem_dim=16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    variables = _init_vars(model, x)
    q = build_quantized(model, variables, x, dtype=jnp.float32)
    path = str(tmp_path / "final.i8")
    save_quantized(q, path, "final", {"mem_size": 8, "mem_dim": 16})

    art = load_quantized(path)
    assert art.doc["family"] == "dg" and art.doc["dtype"] == "float32"
    assert art.quantized.scales == q.scales
    d0, c0 = q._jitted(q.qparams, x)
    d1, c1 = art.quantized._jitted(art.quantized.qparams, x)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


CCTRANS_SMALL = {
    "embed_dims": (32, 64, 128, 256), "num_heads": (2, 4, 8, 16),
    "depths": (1, 1, 2, 2), "wss": (4, 4, 4, 4), "sr_ratios": (8, 4, 2, 1),
}


@pytest.mark.parametrize("name,kw,has_extras",
                         [("csrnet", {}, False),
                          ("dssinet", {}, True),
                          ("cctrans", CCTRANS_SMALL, True)])
def test_convnet_artifact_roundtrip(tmp_path, name, kw, has_extras):
    model = MODELS.build(name, **kw)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = _init_vars(model, x, dropout=False)
    # min_ch=0 so thin sites quantize too — exercises the full site set
    q = build_quantized(model, variables, x, dtype=jnp.float32, min_ch=0)
    assert any("w8" in s for s in q.qparams["sites"].values())
    assert ("extras" in q.qparams) == has_extras
    path = str(tmp_path / f"{name}.i8")
    save_quantized(q, path, name, kw)

    art = load_quantized(path)
    assert art.doc["family"] == "convnet"
    assert ("extras" in art.quantized.qparams) == has_extras
    out0 = np.asarray(q._jitted(q.qparams, x))
    out1 = np.asarray(art.quantized._jitted(art.quantized.qparams, x))
    np.testing.assert_array_equal(out0, out1)


def test_all_fp_artifact_roundtrip(tmp_path):
    """MCNN under the serving default min_ch=128 keeps every site bf16
    (max 48 channels) — the artifact must round-trip the all-fp edge."""
    model = MODELS.build("mcnn")
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = _init_vars(model, x, dropout=False)
    q = build_quantized(model, variables, x, dtype=jnp.float32)
    assert not any("w8" in s for s in q.qparams["sites"].values())
    path = str(tmp_path / "mcnn.i8")
    save_quantized(q, path, "mcnn")

    art = load_quantized(path)
    out0 = np.asarray(q._jitted(q.qparams, x))
    out1 = np.asarray(art.quantized._jitted(art.quantized.qparams, x))
    np.testing.assert_array_equal(out0, out1)


def test_load_rejects_non_artifact(tmp_path):
    from flax import serialization

    path = str(tmp_path / "junk.i8")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize({"format": "other"}))
    with pytest.raises(ValueError, match="not a dgvcc-int8-v1"):
        load_quantized(path)


def test_video_counter_from_artifact(tmp_path):
    """Deploy path: quantize once, serve replicas from the artifact —
    counts bit-equal the build-time quantized counter's."""
    from dgvcc_tpu.serve import VideoCounter

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    built = VideoCounter.from_checkpoint(
        "final", None, dtype=jnp.float32, quantize=True,
        calib_frames=frames, mem_size=8, mem_dim=16)
    path = str(tmp_path / "final.i8")
    save_quantized(built.quantized, path, "final",
                   {"mem_size": 8, "mem_dim": 16})

    served = VideoCounter.from_artifact(path, dtype=jnp.float32)
    assert served.quantized is not None and not served._quant_pending
    np.testing.assert_array_equal(built.count_frames(frames),
                                  served.count_frames(frames))


def test_cli_quantize_then_serve_artifact(tmp_path, capsys):
    """--task quantize writes the artifact from a checkpoint + calib
    frames; --task serve --artifact serves it with no checkpoint."""
    import yaml
    from flax import serialization
    from flax.core import unfreeze
    from PIL import Image

    from dgvcc_tpu.cli.main import run

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(frames / f"f{i}.jpg")

    # a real (random-init) checkpoint for --task quantize to load
    model = MODELS.build("base", pretrained=False)
    variables = _init_vars(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    ckpt = tmp_path / "model.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"params": unfreeze(variables["params"]),
         "batch_stats": unfreeze(variables.get("batch_stats", {}))}))

    cfg = {
        "seed": 0, "version": "quant_t", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": str(ckpt),
        "model": {"name": "base", "params": {"pretrained": False}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    art = tmp_path / "base.i8"
    run(str(p), "quantize", frames=str(frames), out=str(art))
    out = capsys.readouterr().out
    assert "[quantize] wrote" in out and art.exists()

    run(str(p), "serve", frames=str(frames), batch=2, artifact=str(art))
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("f")]
    assert len(lines) == 3 and all(np.isfinite(float(ln.split()[1]))
                                   for ln in lines)
    assert "[serve] 3 frames" in out
