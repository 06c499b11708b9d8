"""Serving fleet: N replica processes behind one load-balancing proxy.

The mesh serving paths (serve.py `mesh=`) scale ONE program across
chips; the fleet scales the other way — one *process per chip* (the
standard highest-throughput deployment: no cross-chip collectives, no
shared Python GIL, per-replica XLA queues), stitched together by a tiny
stdlib round-robin proxy:

    python -m dgvcc_tpu.serve_fleet --config cfg.yml --port 8000 \
        --replicas 4 --devices 0,1,2,3 --aot model.aot

Each replica is the ordinary CLI serving endpoint (`--task serve
--http`) pinned to its chip via TPU_VISIBLE_CHIPS (the shared pinning
helper, utils/devices.py); deploy inputs (--aot / --artifact / config
checkpoint) pass straight through, so the fleet composes with every
artifact kind. The proxy:

- POST /count       → next healthy replica, round-robin; a dead replica
                      fails over to the next one mid-request. Replica
                      HTTP errors (bad image, unexported AOT shape)
                      pass through body-and-code intact.
- GET  /healthz     → aggregate ({"status": ok|degraded|down}, per-
                      replica detail).
- GET  /stats       → monotonic counters summed across replicas (dead /
                      respawned replicas keep contributing their last-
                      seen totals) + per-replica list.
- health loop       → background probe every --probe-s seconds marks
                      replicas in/out of rotation; with --restart, dead
                      replica *processes* are respawned on a fresh port
                      (failure recovery for serving, matching the
                      trainer's preemption-safe story).

Reference analog: none — the reference serves by running `--task test`
manually per GPU (trainers/trainer.py:90-103). Beyond-reference.
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

from dgvcc_tpu.utils.devices import chip_env

_STAT_KEYS = ("frames", "batches", "device_s",
              "dispatch_fp", "dispatch_int8")


def _free_port() -> int:
    # NOTE: classic TOCTOU — the port is released before the replica
    # binds it. A conflict makes that replica exit at startup; with
    # --restart it respawns on a NEW port (see _health_loop), so a
    # collision costs one restart, not a livelock.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _ReplicaHTTPError(Exception):
    """A replica answered with an HTTP error — that's the client's
    answer (bad image, unexported shape), carried through verbatim."""

    def __init__(self, code: int, payload: dict):
        super().__init__(f"replica HTTP {code}")
        self.code = code
        self.payload = payload


class Replica:
    """One serving subprocess + its rotation state."""

    def __init__(self, make_cmd: Callable[[int], List[str]], env: dict,
                 port: int):
        self.make_cmd = make_cmd
        self.env = env
        self.port = port
        self.proc: Optional[subprocess.Popen] = None
        self.healthy = False
        self.restarts = 0
        self.next_restart_t = 0.0  # monotonic gate (exponential backoff)
        # monotonic /stats support: totals already credited from prior
        # incarnations + the last totals seen from the live process
        self.retired = dict.fromkeys(_STAT_KEYS, 0)
        self.last_stats = dict.fromkeys(_STAT_KEYS, 0)

    def start(self):
        self.proc = subprocess.Popen(self.make_cmd(self.port), env=self.env)

    def respawn(self):
        """Fold the dead incarnation's counters into the retired base,
        move to a fresh port (the old one may be what killed it), and
        start a new process."""
        for k in _STAT_KEYS:
            self.retired[k] = self.retired.get(k, 0) + self.last_stats.get(k, 0)
            self.last_stats[k] = 0
        self.restarts += 1
        self.port = _free_port()
        self.start()

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
                 quantize=False, frames_dir: str = None,
                 restart: bool = False, probe_s: float = 2.0,
                 request_timeout: float = 300.0):
        if devices and len(devices) != replicas:
            raise ValueError(f"--devices lists {len(devices)} ids for "
                             f"{replicas} replicas")
        if artifact and quantize == "auto":
            # fail in the parent, not N replica crash loops: an int8
            # artifact has no fp weights for auto's small-batch path
            # (same guard as cli/main.py::_build_counter)
            raise ValueError("--quantize auto cannot serve an "
                             "--artifact: the int8 artifact has no fp "
                             "weights for the small-batch path")
        self.restart = restart
        self.probe_s = probe_s
        self.request_timeout = request_timeout
        self._rr = 0
        self._rr_lock = threading.Lock()
        self._stopping = False
        self._serving = False

        def make_cmd(rport: int) -> List[str]:
            cmd = [sys.executable, "-m", "dgvcc_tpu.cli.main",
                   "--config", config, "--task", "serve",
                   "--http", str(rport), "--batch", str(batch)]
            if aot:
                cmd += ["--aot", aot]
            if artifact:
                cmd += ["--artifact", artifact]
            if ckpt:
                cmd += ["--ckpt", ckpt]
            if quantize == "auto":
                # per-dispatch precision in each replica (serve.py)
                cmd += ["--quantize", "auto"]
            elif quantize:
                cmd += ["--quantize"]
            if frames_dir:
                cmd += ["--frames", frames_dir]
            return cmd

        self.replicas = [
            Replica(make_cmd, chip_env(devices[i] if devices else None),
                    _free_port())
            for i in range(replicas)
        ]

        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self._httpd.daemon_threads = True
        self._health_thread = threading.Thread(target=self._health_loop,
                                               daemon=True)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    # -- lifecycle -----------------------------------------------------

    def _spawn_and_wait(self, ready_timeout: float):
        """Spawn every replica and wait for one to serve; on ANY
        failure, stop them all — a readiness timeout must not leak N
        chip-holding orphan processes."""
        try:
            for rep in self.replicas:
                rep.start()
            self._wait_ready(ready_timeout)
            self._health_thread.start()
        except BaseException:
            for rep in self.replicas:
                rep.stop()
            self._httpd.server_close()
            raise

    def start(self, ready_timeout: float = 300.0) -> threading.Thread:
        """Spawn replicas, wait until at least one is serving, then
        serve the proxy on a daemon thread (tests, embedding)."""
        self._spawn_and_wait(ready_timeout)
        self._serving = True
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self, ready_timeout: float = 300.0):
        self._spawn_and_wait(ready_timeout)
        n_up = sum(r.healthy for r in self.replicas)
        print(f"[fleet] {n_up}/{len(self.replicas)} replicas up; "
              f"proxy on :{self.port}", flush=True)
        try:
            self._serving = True
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
        if self._serving:
            # only valid while serve_forever runs — BaseServer.shutdown
            # on a never-served server waits on an event that's never set
            self._serving = False
            self._httpd.shutdown()
        self._httpd.server_close()
        # join the health loop BEFORE stopping replicas — otherwise a
        # --restart loop mid-iteration could respawn a replica we just
        # terminated, leaving an orphan process after the fleet exits
        if self._health_thread.is_alive():
            self._health_thread.join(timeout=self.probe_s + 10.0)
        for rep in self.replicas:
            rep.stop()

    # -- health --------------------------------------------------------

    def _health_loop(self):
        while not self._stopping:
            for rep in self.replicas:
                if self._stopping:
                    return
                rep.probe()
                if (self.restart and not rep.alive()
                        and not self._stopping
                        and time.monotonic() >= rep.next_restart_t):
                    old = rep.port
                    rep.respawn()
                    # exponential backoff (cap 60 s): a permanently-
                    # broken replica must not turn into a restart storm
                    rep.next_restart_t = time.monotonic() + min(
                        60.0, self.probe_s * (2 ** min(rep.restarts, 10)))
                    print(f"[fleet] replica :{old} died — restart "
                          f"#{rep.restarts} on :{rep.port}", flush=True)
            # nap in small slices so shutdown() doesn't block on a full
            # probe interval
            deadline = time.monotonic() + self.probe_s
            while not self._stopping and time.monotonic() < deadline:
                time.sleep(0.1)

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
                # the replica is alive and rejected the request — relay
                # its own JSON error (e.g. the AOT shape inventory), not
                # a bare reason phrase
                try:
                    payload = json.load(e)
                except Exception:
                    payload = {"error": e.reason}
                raise _ReplicaHTTPError(e.code, payload) from e
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
        """Fleet totals are MONOTONIC: each replica contributes its
        retired-incarnation base plus the freshest totals seen from the
        live process (kept when it dies), so a crash or respawn never
        makes the aggregate counters go backwards."""
        per = []
        total = dict.fromkeys(_STAT_KEYS, 0)
        for rep in self.replicas:
            live = None
            if rep.healthy:
                try:
                    live = rep.get("/stats")
                except Exception:
                    pass
            if live is not None:
                for k in _STAT_KEYS:
                    rep.last_stats[k] = live.get(k, 0)
                per.append({"port": rep.port, **live})
            for k in _STAT_KEYS:
                # .get: a replica may predate a stat key (or a test
                # seeds a partial dict) — missing contributes zero
                total[k] += rep.retired.get(k, 0) + rep.last_stats.get(k, 0)
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
                except _ReplicaHTTPError as e:
                    self._json(e.code, e.payload)
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
    ap.add_argument("--quantize", nargs="?", const=True, default=False,
                    choices=[True, False, "auto"], metavar="auto",
                    help="int8 replicas; 'auto' picks int8 vs bf16 per "
                         "dispatch inside each replica")
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
