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


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/count", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/nope")
    assert e.value.code == 404
