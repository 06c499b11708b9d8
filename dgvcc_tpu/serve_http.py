"""HTTP serving front-end for VideoCounter — stdlib only.

Beyond-reference deploy surface (the reference's closest analog is the
serial eval loop, trainers/trainer.py:90-103): a threaded HTTP server
wrapping one VideoCounter, so a TPU chip serves crowd counts over the
network. Pairs with the int8 artifact path (nn/quant_io.py): a replica
starts from `--task serve --artifact model.i8 --http PORT` with no
checkpoint or calibration imagery.

Routes:
    GET  /healthz  → {"status": "ok", "model": ..., "quantized": ...}
    GET  /stats    → {"frames": N, "requests": N, "fps": ...}
    POST /count    → {"count": float}   (body: JPEG/PNG image bytes)

Inference is serialized behind a lock: the TPU executes one program at
a time anyway, and VideoCounter's lazy int8 calibration isn't
concurrent-safe. Threading still helps — decode/encode of request t+1
overlaps device compute of request t.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class CountingServer:
    """Owns the HTTP server; `serve_forever` blocks, `start` threads."""

    def __init__(self, counter, host: str = "127.0.0.1", port: int = 8000,
                 model_name: str = "?"):
        self.counter = counter
        self.model_name = model_name
        self._lock = threading.Lock()
        self._stats = {"frames": 0, "requests": 0, "device_s": 0.0}
        self.httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self.httpd.daemon_threads = True

    @property
    def port(self) -> int:  # resolved port (0 → ephemeral)
        return self.httpd.server_address[1]

    def _count_image(self, body: bytes) -> float:
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        frame = np.asarray(img, np.uint8)[None]
        with self._lock:
            t0 = time.perf_counter()
            count = float(self.counter.count_frames(frame)[0])
            self._stats["device_s"] += time.perf_counter() - t0
            self._stats["frames"] += 1
        return count

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: stats live at /stats
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                server._stats["requests"] += 1
                if self.path == "/healthz":
                    q = server.counter.quantized is not None
                    self._json(200, {"status": "ok",
                                     "model": server.model_name,
                                     "quantized": q})
                elif self.path == "/stats":
                    s = dict(server._stats)
                    s["fps"] = (s["frames"] / s["device_s"]
                                if s["device_s"] > 0 else 0.0)
                    self._json(200, s)
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                server._stats["requests"] += 1
                if self.path != "/count":
                    self._json(404, {"error": f"no route {self.path}"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    self._json(400, {"error": "empty body"})
                    return
                body = self.rfile.read(n)
                try:
                    count = server._count_image(body)
                except Exception as e:  # undecodable image, OOM-size, ...
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {"count": count})

        return Handler

    def start(self) -> threading.Thread:
        """Serve on a daemon thread (tests, embedding); returns it."""
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self):
        print(f"[serve] http on :{self.port} "
              f"(POST /count, GET /healthz, GET /stats)")
        try:
            self.httpd.serve_forever()
        except KeyboardInterrupt:
            pass

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
