"""HTTP serving front-end for VideoCounter — stdlib only.

Beyond-reference deploy surface (the reference's closest analog is the
serial eval loop, trainers/trainer.py:90-103): a threaded HTTP server
wrapping one VideoCounter, so a TPU chip serves crowd counts over the
network. Pairs with the int8 artifact path (nn/quant_io.py): a replica
starts from `--task serve --artifact model.i8 --http PORT` with no
checkpoint or calibration imagery.

Routes:
    GET  /healthz  → {"status": "ok", "model": ..., "quantized": ...}
    GET  /stats    → {"frames": N, "requests": N, "batches": N, "fps": ...,
                      "dispatch_fp": N, "dispatch_int8": N}  (per-precision
                     dispatch counters — shows what quantize="auto" chose)
    GET  /metrics  → the same counters in Prometheus text exposition
                     format (scrapeable; no dependencies)
    POST /count    → {"count": float}   (body: JPEG/PNG image bytes)

Concurrency model: request threads only decode/encode; a single
dispatcher thread owns the device. Same-shape frames that arrive
within ``batch_window`` (seconds) are stacked into ONE device batch of
up to ``max_batch`` — a TPU at serving sizes is batch-limited, not
request-limited, so micro-batching multiplies concurrent-client
throughput while a lone client pays at most one window of latency.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pending:
    __slots__ = ("frame", "event", "result", "error")

    def __init__(self, frame):
        self.frame = frame
        self.event = threading.Event()
        self.result = None
        self.error = None


class CountingServer:
    """Owns the HTTP server; `serve_forever` blocks, `start` threads."""

    def __init__(self, counter, host: str = "127.0.0.1", port: int = 8000,
                 model_name: str = "?", max_batch: int = 8,
                 batch_window: float = 0.005):
        self.counter = counter
        self.model_name = model_name
        self.max_batch = max(1, int(max_batch))
        self.batch_window = batch_window
        self._stats = {"frames": 0, "requests": 0, "batches": 0,
                       "device_s": 0.0}
        self._stats_lock = threading.Lock()
        self._work: deque = deque()
        self._cv = threading.Condition()
        self._stopping = False
        self._serving = False
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()
        self.httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self.httpd.daemon_threads = True

    @property
    def port(self) -> int:  # resolved port (0 → ephemeral)
        return self.httpd.server_address[1]

    # -- device side -------------------------------------------------------

    def _submit(self, frame: np.ndarray, timeout: float = 300.0) -> float:
        """Queue one (H, W, 3) uint8 frame; block until its count."""
        p = _Pending(frame)
        with self._cv:
            if self._stopping:
                raise RuntimeError("server shutting down")
            self._work.append(p)
            self._cv.notify()
        if not p.event.wait(timeout):
            raise TimeoutError("inference queue timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def _take_batch(self):
        """Pop the oldest request plus same-shape followers, waiting up
        to batch_window for more to arrive (single consumer)."""
        with self._cv:
            while not self._work:
                if self._stopping:
                    return []
                self._cv.wait(timeout=0.1)
            batch = [self._work.popleft()]
        deadline = time.monotonic() + self.batch_window
        shape = batch[0].frame.shape
        while len(batch) < self.max_batch:
            with self._cv:
                # scan for same-shape requests; mixed shapes stay queued
                # for their own batch (each shape is its own program)
                i = next((j for j, p in enumerate(self._work)
                          if p.frame.shape == shape), None)
                if i is not None:
                    self._work.rotate(-i)
                    batch.append(self._work.popleft())
                    self._work.rotate(i)
                    continue
            rem = deadline - time.monotonic()
            if rem <= 0:
                break
            time.sleep(min(rem, 0.001))
        return batch

    def _dispatch_loop(self):
        while not self._stopping:
            batch = self._take_batch()
            if not batch:
                continue
            try:
                frames = np.stack([p.frame for p in batch])
                t0 = time.perf_counter()
                counts = self.counter.count_frames(frames)
                dt = time.perf_counter() - t0
                with self._stats_lock:
                    self._stats["device_s"] += dt
                    self._stats["frames"] += len(batch)
                    self._stats["batches"] += 1
                for p, c in zip(batch, counts):
                    p.result = float(c)
            except Exception as e:  # surface to every waiting request
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.event.set()
        # shutdown: fail fast for anything queued behind the last batch
        # instead of leaving its handler thread waiting out the timeout
        with self._cv:
            stranded, self._work = list(self._work), deque()
        for p in stranded:
            p.error = RuntimeError("server shutting down")
            p.event.set()

    def _count_image(self, body: bytes) -> float:
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        return self._submit(np.asarray(img, np.uint8))

    # -- http side ----------------------------------------------------------

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
                with server._stats_lock:
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
                    d = getattr(server.counter, "dispatches", None)
                    if d is not None:  # AotCounter has no live graphs
                        s["dispatch_fp"] = d["fp"]
                        s["dispatch_int8"] = d["int8"]
                    self._json(200, s)
                elif self.path == "/metrics":
                    s = dict(server._stats)
                    d = getattr(server.counter, "dispatches",
                                {"fp": 0, "int8": 0})
                    lines = []
                    for name, kind, val in (
                            ("dgvcc_frames_total", "counter", s["frames"]),
                            ("dgvcc_requests_total", "counter",
                             s["requests"]),
                            ("dgvcc_batches_total", "counter",
                             s["batches"]),
                            ("dgvcc_device_seconds_total", "counter",
                             s["device_s"]),
                            ("dgvcc_dispatch_fp_total", "counter",
                             d["fp"]),
                            ("dgvcc_dispatch_int8_total", "counter",
                             d["int8"])):
                        lines += [f"# TYPE {name} {kind}", f"{name} {val}"]
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                with server._stats_lock:
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
        self._serving = True
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self):
        """Blocking serve; SIGTERM/SIGINT shut down cleanly (in-flight
        batches finish, queued requests get fail-fast errors)."""
        import signal

        print(f"[serve] http on :{self.port} "
              f"(POST /count, GET /healthz, GET /stats)")
        self._serving = True
        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(
                    sig, lambda *_: threading.Thread(
                        target=self.shutdown, daemon=True).start())
            except ValueError:  # non-main thread: no handler possible
                pass
        try:
            self.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            for sig, h in prev.items():
                signal.signal(sig, h)

    def shutdown(self):
        self._stopping = True
        with self._cv:
            self._cv.notify_all()
        if self._serving:
            # socketserver.shutdown() blocks on the serve_forever loop;
            # calling it with no loop running would wait forever
            self.httpd.shutdown()
        self.httpd.server_close()
