"""Serving fleet: N replica processes behind one load-balancing proxy.

The mesh serving paths (serve.py `mesh=`) scale ONE program across
chips; the fleet scales the other way — one *process per chip* (the
standard highest-throughput deployment: no cross-chip collectives, no
shared Python GIL, per-replica XLA queues), stitched together by a tiny
stdlib round-robin proxy:

    python -m dgvcc_tpu.serve_fleet --config cfg.yml --port 8000 \
        --replicas 4 --devices 0,1,2,3 --aot model.aot

Each replica is the ordinary CLI serving endpoint (`--task serve
--http`) pinned to its chip via TPU_VISIBLE_CHIPS (the launcher's
per-experiment pinning, scripts/launch.py::build_env); deploy inputs
(--aot / --artifact / config checkpoint) pass straight through, so the
fleet composes with every artifact kind. The proxy:

- POST /count       → next healthy replica, round-robin; a dead replica
                      fails over to the next one mid-request.
- GET  /healthz     → aggregate ({"status": ok|degraded|down}, per-
                      replica detail).
- GET  /stats       → counters summed across replicas + per-replica list.
- health loop       → background probe every --probe-s seconds marks
                      replicas in/out of rotation; with --restart, dead
                      replica *processes* are respawned (failure
                      recovery for serving, matching the trainer's
                      preemption-safe story).

Reference analog: none — the reference serves by running `--task test`
manually per GPU (trainers/trainer.py:90-103). Beyond-reference.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _replica_env(device: Optional[str]) -> dict:
    env = dict(os.environ)
    if device is not None:
        # one chip per replica (scripts/launch.py::build_env semantics)
        env["TPU_VISIBLE_CHIPS"] = device
        env["TPU_PROCESS_BOUNDS"] = "1,1,1"
        env["CUDA_VISIBLE_DEVICES"] = device
    return env


class Replica:
    """One serving subprocess + its rotation state."""

    def __init__(self, cmd: List[str], env: dict, port: int):
        self.cmd = cmd
        self.env = env
        self.port = port
        self.proc: Optional[subprocess.Popen] = None
        self.healthy = False
        self.restarts = 0

    def start(self):
        self.proc = subprocess.Popen(self.cmd, env=self.env)

    def alive(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def probe(self, timeout: float = 5.0) -> bool:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{self.port}/healthz",
                    timeout=timeout) as r:
                self.healthy = (r.status == 200)
        except Exception:
            self.healthy = False
        return self.healthy

    def get(self, path: str, timeout: float = 10.0) -> dict:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{self.port}{path}", timeout=timeout) as r:
            return json.load(r)

    def stop(self):
        if self.alive():
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self.proc.kill()


class FleetServer:
    """Round-robin proxy over replica serving processes."""

    def __init__(self, config: str, replicas: int = 2,
                 devices: Optional[List[str]] = None, port: int = 8000,
                 host: str = "0.0.0.0", batch: int = 4,
                 aot: str = None, artifact: str = None, ckpt: str = None,
                 quantize: bool = False, frames_dir: str = None,
                 restart: bool = False, probe_s: float = 2.0,
                 request_timeout: float = 300.0):
        if devices and len(devices) != replicas:
            raise ValueError(f"--devices lists {len(devices)} ids for "
                             f"{replicas} replicas")
        self.restart = restart
        self.probe_s = probe_s
        self.request_timeout = request_timeout
        self._rr = 0
        self._rr_lock = threading.Lock()
        self._stopping = False

        self.replicas = []
        for i in range(replicas):
            rport = _free_port()
            cmd = [sys.executable, "-m", "dgvcc_tpu.cli.main",
                   "--config", config, "--task", "serve",
                   "--http", str(rport), "--batch", str(batch)]
            if aot:
                cmd += ["--aot", aot]
            if artifact:
                cmd += ["--artifact", artifact]
            if ckpt:
                cmd += ["--ckpt", ckpt]
            if quantize:
                cmd += ["--quantize"]
            if frames_dir:
                cmd += ["--frames", frames_dir]
            self.replicas.append(Replica(
                cmd, _replica_env(devices[i] if devices else None), rport))

        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self._httpd.daemon_threads = True
        self._health_thread = threading.Thread(target=self._health_loop,
                                               daemon=True)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    # -- lifecycle -----------------------------------------------------

    def start(self, ready_timeout: float = 300.0) -> threading.Thread:
        """Spawn replicas, wait until at least one is serving, then
        serve the proxy on a daemon thread (tests, embedding)."""
        for rep in self.replicas:
            rep.start()
        self._wait_ready(ready_timeout)
        self._health_thread.start()
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self, ready_timeout: float = 300.0):
        for rep in self.replicas:
            rep.start()
        self._wait_ready(ready_timeout)
        self._health_thread.start()
        n_up = sum(r.healthy for r in self.replicas)
        print(f"[fleet] {n_up}/{len(self.replicas)} replicas up; "
              f"proxy on :{self.port}", flush=True)
        try:
            self._httpd.serve_forever()
        finally:
            self.shutdown()

    def _wait_ready(self, timeout: float):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if any(rep.probe(timeout=2.0) for rep in self.replicas):
                return
            dead = [r for r in self.replicas if not r.alive()]
            if len(dead) == len(self.replicas):
                raise RuntimeError(
                    "every replica process exited before becoming ready "
                    f"(rc={[r.proc.returncode for r in dead]})")
            time.sleep(0.5)
        raise RuntimeError(f"no replica became healthy in {timeout:.0f}s")

    def shutdown(self):
        self._stopping = True
        self._httpd.shutdown()
        self._httpd.server_close()
        for rep in self.replicas:
            rep.stop()

    # -- health --------------------------------------------------------

    def _health_loop(self):
        while not self._stopping:
            for rep in self.replicas:
                if self._stopping:
                    return
                rep.probe()
                if self.restart and not rep.alive():
                    rep.restarts += 1
                    print(f"[fleet] replica :{rep.port} died — "
                          f"restart #{rep.restarts}", flush=True)
                    rep.start()
            time.sleep(self.probe_s)

    # -- routing -------------------------------------------------------

    def _rotation(self) -> List[Replica]:
        """Healthy replicas starting at the round-robin cursor, then the
        unhealthy ones as a last resort (they may have recovered between
        probes)."""
        with self._rr_lock:
            self._rr += 1
            start = self._rr
        order = [self.replicas[(start + i) % len(self.replicas)]
                 for i in range(len(self.replicas))]
        return ([r for r in order if r.healthy]
                + [r for r in order if not r.healthy])

    def _proxy_count(self, body: bytes) -> dict:
        last_err: Exception = RuntimeError("no replicas configured")
        for rep in self._rotation():
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{rep.port}/count", data=body,
                    method="POST")
                with urllib.request.urlopen(
                        req, timeout=self.request_timeout) as r:
                    return json.load(r)
            except urllib.error.HTTPError as e:
                # the replica is alive and rejected the request (bad
                # image, unexported shape) — that's the client's answer,
                # not a failover condition
                raise
            except Exception as e:  # connection refused / reset / timeout
                rep.healthy = False
                last_err = e
        raise ConnectionError(f"all replicas unavailable: {last_err}")

    def _aggregate_health(self) -> dict:
        detail = [{"port": r.port, "healthy": r.healthy,
                   "alive": r.alive(), "restarts": r.restarts}
                  for r in self.replicas]
        up = sum(d["healthy"] for d in detail)
        status = ("ok" if up == len(detail) else
                  "degraded" if up else "down")
        return {"status": status, "replicas": detail}

    def _aggregate_stats(self) -> dict:
        per = []
        total = {"frames": 0, "batches": 0, "device_s": 0.0}
        for rep in self.replicas:
            if not rep.healthy:
                continue
            try:
                s = rep.get("/stats")
            except Exception:
                continue
            per.append({"port": rep.port, **s})
            for k in total:
                total[k] += s.get(k, 0)
        total["replicas"] = per
        return total

    # -- http ----------------------------------------------------------

    def _handler_class(self):
        fleet = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    h = fleet._aggregate_health()
                    self._json(200 if h["status"] != "down" else 503, h)
                elif self.path == "/stats":
                    self._json(200, fleet._aggregate_stats())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/count":
                    self._json(404, {"error": "not found"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                try:
                    self._json(200, fleet._proxy_count(body))
                except urllib.error.HTTPError as e:
                    self._json(e.code, {"error": e.reason})
                except ConnectionError as e:
                    self._json(503, {"error": str(e)})

        return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--replicas", type=int, default=1)
    ap.add_argument("--devices", default=None,
                    help="comma-separated chip ids, one per replica "
                         "(TPU_VISIBLE_CHIPS pinning)")
    ap.add_argument("--batch", type=int, default=4,
                    help="per-replica request micro-batch bound")
    ap.add_argument("--aot", default=None, help="AOT program artifact")
    ap.add_argument("--artifact", default=None, help="int8 artifact")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint override forwarded to replicas")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--frames", default=None,
                    help="calibration imagery dir (with --quantize)")
    ap.add_argument("--restart", action="store_true",
                    help="respawn dead replica processes")
    ap.add_argument("--probe-s", type=float, default=2.0)
    args = ap.parse_args(argv)

    fleet = FleetServer(
        args.config, replicas=args.replicas,
        devices=args.devices.split(",") if args.devices else None,
        port=args.port, batch=args.batch, aot=args.aot,
        artifact=args.artifact, ckpt=args.ckpt, quantize=args.quantize,
        frames_dir=args.frames, restart=args.restart, probe_s=args.probe_s)
    fleet.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
