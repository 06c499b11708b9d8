"""Serving-fleet soak (VERDICT r4 item 7): sustained mixed load with a
mid-soak replica kill.

Drives a FleetServer (replica subprocesses + round-robin failover
proxy, --restart on) with phases of varying client concurrency —
latency-regime (1 client) and throughput-regime (N clients, requests
coalesce in each replica's micro-batcher) — while:

  * a replica process is SIGKILLed mid-load: the proxy must fail the
    requests over (zero client-visible drops) and the health loop must
    respawn the process on a fresh port;
  * fleet /stats counters are sampled throughout and asserted
    MONOTONIC across the death + respawn (the retired-incarnation
    accounting in serve_fleet.py::_aggregate_stats);
  * per-request latencies are recorded per phase → p50/p95/p99.

Exit code 0 = soak passed (no drops, counters monotonic, respawn seen).
One JSON summary line on stdout.

Usage:
    python scripts/soak_fleet.py [--replicas 2] [--duration 90]
        [--model mcnn] [--hw 64 64] [--quantize auto] [--clients 6]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_frame_bytes(h: int, w: int, seed: int = 0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    ).save(buf, "PNG")
    return buf.getvalue()


def _get(port, path, timeout=30):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return json.load(r)


# counters that must never decrease fleet-wide (serve_http._STAT_KEYS
# subset that is cumulative)
_MONO = ("frames", "batches", "dispatch_fp", "dispatch_int8")


class StatsSampler(threading.Thread):
    """Samples fleet /stats ~2 Hz; records any counter regression."""

    def __init__(self, port):
        super().__init__(daemon=True)
        self.port = port
        self.stop_evt = threading.Event()
        self.violations = []
        self.samples = 0
        self.last = None

    def run(self):
        while not self.stop_evt.is_set():
            try:
                s = _get(self.port, "/stats", timeout=10)
            except Exception:
                time.sleep(0.5)
                continue
            cur = {k: s.get(k, 0) for k in _MONO}
            if self.last is not None:
                for k in _MONO:
                    if cur[k] < self.last[k]:
                        self.violations.append(
                            {"key": k, "prev": self.last[k], "now": cur[k]})
            self.last = cur
            self.samples += 1
            time.sleep(0.5)


def run_phase(port, bodies, clients, deadline, latencies, errors):
    """Fire `clients` threads posting round-robin frames until
    deadline; append (t_done, latency_s) per success."""

    def client(i):
        k = 0
        while time.monotonic() < deadline:
            body = bodies[(i + k) % len(bodies)]
            k += 1
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/count", data=body, method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    json.load(r)
            except Exception as e:  # a DROP — the soak's failure signal
                errors.append(repr(e))
                continue
            latencies.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--replicas", type=int, default=2)
    ap.add_argument("--duration", type=float, default=90.0,
                    help="total soak seconds across the 3 phases")
    ap.add_argument("--model", default="mcnn")
    ap.add_argument("--hw", type=int, nargs=2, default=(64, 64))
    ap.add_argument("--clients", type=int, default=6,
                    help="thread count of the throughput phases")
    ap.add_argument("--quantize", default=False,
                    help="False | true | auto (replica precision)")
    ap.add_argument("--batch", type=int, default=4,
                    help="replica micro-batch cap")
    args = ap.parse_args()

    import yaml

    from dgvcc_tpu.serve_fleet import FleetServer

    tmp = tempfile.mkdtemp(prefix="soak_")
    cfg = {
        "seed": 0, "version": "soak", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None, "model": {"name": args.model, "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": os.path.join(tmp, "logs"),
    }
    cfg_path = os.path.join(tmp, "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    os.environ.setdefault("PYTHONPATH", REPO)

    quant = {"true": True, "false": False, "False": False,
             "auto": "auto"}.get(str(args.quantize), False)
    fleet = FleetServer(cfg_path, replicas=args.replicas, port=0,
                        batch=args.batch, probe_s=0.5, restart=True,
                        quantize=quant)
    fleet.start(ready_timeout=600)
    summary = {"ok": False}
    try:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            if _get(fleet.port, "/healthz")["status"] == "ok":
                break
            time.sleep(1)
        assert _get(fleet.port, "/healthz")["status"] == "ok", \
            "fleet did not become fully healthy"

        bodies = [make_frame_bytes(*args.hw, seed=s) for s in range(4)]
        # warm every replica's compile cache outside the timed window
        for _ in range(2 * args.replicas):
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{fleet.port}/count", data=bodies[0],
                method="POST"), timeout=600).read()

        sampler = StatsSampler(fleet.port)
        sampler.start()
        errors: list = []
        phase_dur = args.duration / 3
        phases = {}

        # phase 1: throughput load (N clients, micro-batches coalesce)
        lat1: list = []
        run_phase(fleet.port, bodies, args.clients,
                  time.monotonic() + phase_dur, lat1, errors)
        phases["throughput"] = lat1

        # phase 2: latency regime (1 client) with a MID-PHASE KILL
        lat2: list = []
        victim = fleet.replicas[0]
        old_port, old_restarts = victim.port, victim.restarts

        def killer():
            time.sleep(phase_dur / 3)
            if victim.proc is not None:
                victim.proc.kill()
                print(f"[soak] killed replica :{old_port}", flush=True)

        kt = threading.Thread(target=killer, daemon=True)
        kt.start()
        run_phase(fleet.port, bodies, 1,
                  time.monotonic() + phase_dur, lat2, errors)
        kt.join()
        phases["latency_with_kill"] = lat2

        # phase 3: mixed load again; the respawned replica must be
        # back in rotation before the phase ends
        lat3: list = []
        run_phase(fleet.port, bodies, args.clients,
                  time.monotonic() + phase_dur, lat3, errors)
        phases["throughput_post_respawn"] = lat3

        # give the health loop a beat, then check the respawn happened
        t_end = time.monotonic() + 30
        while time.monotonic() < t_end and victim.restarts == old_restarts:
            time.sleep(0.5)
        # the respawned replica recompiles from scratch — wait (bounded)
        # for it to finish warming and rejoin rotation: "returns to ok"
        # IS the assertion, not "ok within one probe interval"
        t_end = time.monotonic() + 300
        health = _get(fleet.port, "/healthz")
        while time.monotonic() < t_end and health["status"] != "ok":
            time.sleep(2)
            health = _get(fleet.port, "/healthz")
        stats = _get(fleet.port, "/stats")
        sampler.stop_evt.set()
        sampler.join(timeout=5)

        def pct(lat):
            if not lat:
                return {}
            a = np.asarray(lat) * 1e3
            return {"n": len(lat),
                    "p50_ms": round(float(np.percentile(a, 50)), 1),
                    "p95_ms": round(float(np.percentile(a, 95)), 1),
                    "p99_ms": round(float(np.percentile(a, 99)), 1),
                    "req_per_s": round(len(lat) / phase_dur, 2)}

        n_total = sum(len(v) for v in phases.values())
        summary = {
            "replicas": args.replicas, "model": args.model,
            "hw": f"{args.hw[0]}x{args.hw[1]}", "quantize": str(quant),
            "duration_s": args.duration, "requests": n_total,
            "dropped": len(errors), "errors_sample": errors[:3],
            "killed_replica_respawned": victim.restarts > old_restarts,
            "restarts": [r.restarts for r in fleet.replicas],
            "health": health["status"],
            "stat_samples": sampler.samples,
            "counter_violations": sampler.violations,
            "dispatch_fp": stats.get("dispatch_fp", 0),
            "dispatch_int8": stats.get("dispatch_int8", 0),
            **{f"phase_{k}": pct(v) for k, v in phases.items()},
        }
        summary["ok"] = (len(errors) == 0
                         and not sampler.violations
                         and summary["killed_replica_respawned"]
                         and health["status"] == "ok"
                         and n_total > 0)
    finally:
        fleet.shutdown()
        print(json.dumps(summary), flush=True)
    sys.exit(0 if summary.get("ok") else 1)


if __name__ == "__main__":
    main()
