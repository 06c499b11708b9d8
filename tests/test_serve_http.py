"""HTTP serving front-end (serve_http.py): routes, counts, errors."""

import io
import json
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from dgvcc_tpu.serve import VideoCounter
    from dgvcc_tpu.serve_http import CountingServer

    counter = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                           pretrained=False)
    srv = CountingServer(counter, port=0, model_name="base")
    srv.start()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=30) as r:
        return json.load(r)


def _post(srv, path, body):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}",
                                 data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.load(r)


def test_healthz(server):
    assert _get(server, "/healthz") == {"status": "ok", "model": "base",
                                        "quantized": False}


def test_count_matches_direct(server):
    from PIL import Image

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, "PNG")  # lossless: decode == frame

    got = _post(server, "/count", buf.getvalue())["count"]
    ref = float(server.counter.count_frames(frame[None])[0])
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    stats = _get(server, "/stats")
    assert stats["frames"] >= 1 and stats["fps"] > 0

    # prometheus exposition mirrors the same counters
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "# TYPE dgvcc_frames_total counter" in text
    assert f"dgvcc_frames_total {stats['frames']}" in text
    assert "dgvcc_device_seconds_total" in text

    # per-precision dispatch counters: this fp server dispatched fp only
    assert stats["dispatch_fp"] >= 1 and stats["dispatch_int8"] == 0
    assert f"dgvcc_dispatch_fp_total {stats['dispatch_fp']}" in text


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/count", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/nope")
    assert e.value.code == 404


class _StubCounter:
    """Records dispatch batch sizes; count = frame mean (per-request
    distinguishable so batching can't cross wires)."""

    quantized = None

    def __init__(self):
        self.batch_sizes = []

    def count_frames(self, frames):
        self.batch_sizes.append(len(frames))
        return frames.reshape(len(frames), -1).mean(axis=1)


def test_microbatching_groups_same_shape_requests():
    import threading

    from dgvcc_tpu.serve_http import CountingServer

    stub = _StubCounter()
    srv = CountingServer(stub, port=0, max_batch=8, batch_window=0.25)
    try:
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                  for _ in range(6)]
        results = [None] * 6

        def post(i):
            results[i] = srv._submit(frames[i])

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(6):
            np.testing.assert_allclose(results[i], frames[i].mean(),
                                       rtol=1e-6)
        # 6 concurrent same-shape requests inside a 250 ms window must
        # coalesce into fewer device dispatches
        assert len(stub.batch_sizes) < 6
        assert sum(stub.batch_sizes) == 6
    finally:
        srv.shutdown()


def test_microbatching_mixed_shapes_stay_separate():
    import threading

    from dgvcc_tpu.serve_http import CountingServer

    stub = _StubCounter()
    srv = CountingServer(stub, port=0, max_batch=8, batch_window=0.2)
    try:
        rng = np.random.default_rng(3)
        small = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        big = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
        out = {}

        def post(key, f):
            out[key] = srv._submit(f)

        threads = [threading.Thread(target=post, args=(k, f))
                   for k, f in (("s", small), ("b", big))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        np.testing.assert_allclose(out["s"], small.mean(), rtol=1e-6)
        np.testing.assert_allclose(out["b"], big.mean(), rtol=1e-6)
        assert sorted(stub.batch_sizes) == [1, 1]  # never stacked together
    finally:
        srv.shutdown()


def test_stress_tool_reports_batching(tmp_path):
    """scripts/stress_http.py end-to-end: drives a live server with
    concurrent clients and reports throughput + mean batch size."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/stress_http.py", "--model", "base",
         "--clients", "4", "--requests", "8", "--hw", "64", "64",
         "--window-ms", "100"],
        capture_output=True, text=True, timeout=600,
        cwd=env["PYTHONPATH"], env=env)
    assert r.returncode == 0, r.stderr[-800:]
    data = json.loads(r.stdout.strip().splitlines()[-1])
    assert data["requests"] == 8
    assert data["req_per_s"] > 0 and data["p95_ms"] > 0
    assert data["mean_batch"] >= 1


def test_cli_serve_http_from_artifact(tmp_path):
    """CLI wiring: --task serve --artifact + HTTP front-end (the replica
    deploy path, non-blocking for the test)."""
    import yaml
    from flax import serialization
    from flax.core import unfreeze

    from dgvcc_tpu.cli.main import _serve_http
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.quant_io import save_quantized
    from dgvcc_tpu.serve import VideoCounter
    from PIL import Image

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 64, 96, 3), dtype=np.uint8)
    built = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                         quantize=True, calib_frames=frames,
                                         pretrained=False)
    art = tmp_path / "base.i8"
    save_quantized(built.quantized, str(art), "base",
                   {"pretrained": False})

    cfg = {
        "seed": 0, "version": "http_t", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "base", "params": {"pretrained": False}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    srv = _serve_http(load_config(str(p)), port=0, artifact=str(art),
                      block=False)
    try:
        h = _get(srv, "/healthz")
        assert h["quantized"] is True and h["model"] == "base"
        buf = io.BytesIO()
        Image.fromarray(frames[0]).save(buf, "PNG")
        got = _post(srv, "/count", buf.getvalue())["count"]
        ref = float(built.count_frames(frames[:1])[0])
        np.testing.assert_allclose(got, ref, rtol=1e-6)
    finally:
        srv.shutdown()


def test_cli_serve_http_from_aot(tmp_path):
    """CLI wiring: --task serve --aot + HTTP front-end — the server
    replays the serialized StableHLO program; an unexported frame shape
    surfaces as a per-request error, not a server crash."""
    import yaml
    from PIL import Image

    from dgvcc_tpu.cli.main import _serve_http
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.nn.aot import export_serving, save_aot
    from dgvcc_tpu.serve import VideoCounter

    built = VideoCounter.from_checkpoint("mcnn", None, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (1, 64, 96, 3), dtype=np.uint8)
    art = tmp_path / "mcnn.aot"
    save_aot(export_serving(built, [(1, 64, 96)]), str(art))

    cfg = {
        "seed": 0, "version": "http_aot", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "mcnn", "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    srv = _serve_http(load_config(str(p)), port=0, aot=str(art), block=False)
    try:
        assert _get(srv, "/healthz")["model"] == "mcnn"
        buf = io.BytesIO()
        Image.fromarray(frames[0]).save(buf, "PNG")
        got = _post(srv, "/count", buf.getvalue())["count"]
        ref = float(built.count_frames(frames)[0])
        np.testing.assert_allclose(got, ref, rtol=1e-6)
        # unexported shape → HTTP error for that request, server lives
        buf2 = io.BytesIO()
        Image.fromarray(np.zeros((200, 300, 3), np.uint8)).save(buf2, "PNG")
        with pytest.raises(urllib.error.HTTPError):
            _post(srv, "/count", buf2.getvalue())
        assert _get(srv, "/healthz")["model"] == "mcnn"
    finally:
        srv.shutdown()
