"""HTTP serving load generator — measures concurrent-client throughput.

Drives a CountingServer (serve_http.py) with T client threads posting
pre-encoded frames, and reports request throughput + the micro-batch
size distribution. The point of request micro-batching is visible here:
with --max-batch 1 every request is its own device program; with the
default window, same-shape requests coalesce and throughput approaches
the device's batched fps instead of its single-frame fps.

Usage (standalone server in-process — no network setup needed):
    python scripts/stress_http.py --model base --clients 8 --requests 64
    python scripts/stress_http.py --artifact model.i8 --clients 16
Or against an already-running server:
    python scripts/stress_http.py --url http://host:8000 --clients 8
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def make_frame_bytes(h: int, w: int, seed: int = 0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    ).save(buf, "PNG")
    return buf.getvalue()


def run_load(url: str, body: bytes, clients: int, requests_per: int):
    errors = []
    latencies = []
    lat_lock = threading.Lock()

    def client(i):
        for _ in range(requests_per):
            req = urllib.request.Request(url + "/count", data=body,
                                         method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    json.load(r)
            except Exception as e:  # noqa: BLE001 — report, keep loading
                errors.append(repr(e))
                return
            with lat_lock:
                latencies.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return wall, latencies, errors


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default=None,
                    help="existing server base URL; omit to start one")
    ap.add_argument("--model", default="base")
    ap.add_argument("--artifact", default=None,
                    help="serve from a saved int8 artifact (quant_io)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64,
                    help="total requests (split across clients)")
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 640))
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=5.0)
    args = ap.parse_args()

    body = make_frame_bytes(*args.hw)
    srv = None
    url = args.url
    if url is None:
        import os

        if os.environ.get("JAX_PLATFORMS") == "cpu":
            # this container's sitecustomize pins the TPU platform; the
            # env var alone is ignored — force it through the config
            import jax

            jax.config.update("jax_platforms", "cpu")
        from dgvcc_tpu.serve import VideoCounter
        from dgvcc_tpu.serve_http import CountingServer

        if args.artifact:
            counter = VideoCounter.from_artifact(args.artifact)
        else:
            counter = VideoCounter.from_checkpoint(args.model, None,
                                                   pretrained=False)
        srv = CountingServer(counter, port=0, model_name=args.model,
                             max_batch=args.max_batch,
                             batch_window=args.window_ms / 1e3)
        srv.start()
        url = f"http://127.0.0.1:{srv.port}"
        # warm the compile cache outside the timed window
        urllib.request.urlopen(urllib.request.Request(
            url + "/count", data=body, method="POST"), timeout=600).read()

    per = max(1, args.requests // args.clients)
    wall, lats, errors = run_load(url, body, args.clients, per)
    n = len(lats)
    if errors:
        print(f"ERRORS ({len(errors)}): {errors[:3]}", file=sys.stderr)
    stats = json.load(urllib.request.urlopen(url + "/stats", timeout=30))
    out = {
        "clients": args.clients, "requests": n, "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 2) if wall > 0 else 0.0,
        "p50_ms": round(1e3 * float(np.percentile(lats, 50)), 1) if n else 0,
        "p95_ms": round(1e3 * float(np.percentile(lats, 95)), 1) if n else 0,
        "mean_batch": (round(stats["frames"] / stats["batches"], 2)
                       if stats.get("batches") else 0),
        "device_fps": round(stats.get("fps", 0.0), 2),
    }
    print(json.dumps(out))
    if srv is not None:
        srv.shutdown()


if __name__ == "__main__":
    main()
