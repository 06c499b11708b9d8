"""Serving fleet (serve_fleet.py): replica processes + LB proxy."""

import io
import json
import os
import time
import urllib.request

import numpy as np
import pytest
import yaml


def _post(port, path, body, timeout=300):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.load(r)


def _get(port, path, timeout=30):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return json.load(r)


def test_fleet_round_robin_failover(tmp_path, monkeypatch):
    """Two replica processes behind the proxy: counts match the
    in-process model bit-for-bit (deterministic init), requests spread
    over both replicas, and killing one replica fails over instead of
    failing the client."""
    import jax.numpy as jnp
    from PIL import Image

    from dgvcc_tpu.serve import VideoCounter
    from dgvcc_tpu.serve_fleet import FleetServer

    monkeypatch.setenv("PYTHONPATH", os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    cfg = {
        "seed": 0, "version": "fleet_t", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "mcnn", "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    bufs = []
    for f in frames:
        b = io.BytesIO()
        Image.fromarray(f).save(b, "PNG")
        bufs.append(b.getvalue())
    # from_checkpoint(None) init is PRNGKey-seeded → every replica and
    # this in-process model hold identical weights
    ref = VideoCounter.from_checkpoint(
        "mcnn", None, dtype=jnp.float32).count_frames(frames)

    fleet = FleetServer(str(p), replicas=2, port=0, batch=2,
                        probe_s=0.5)
    fleet.start(ready_timeout=300)
    try:
        # wait for BOTH replicas to come into rotation
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if _get(fleet.port, "/healthz")["status"] == "ok":
                break
            time.sleep(1)
        assert _get(fleet.port, "/healthz")["status"] == "ok"

        got = [_post(fleet.port, "/count", b)["count"] for b in bufs]
        np.testing.assert_allclose(got, ref, rtol=1e-5)

        stats = _get(fleet.port, "/stats")
        assert stats["frames"] == 4
        assert len(stats["replicas"]) == 2
        assert all(r["frames"] >= 1 for r in stats["replicas"])  # RR spread

        # failover: kill one replica — requests keep succeeding
        fleet.replicas[0].stop()
        got2 = [_post(fleet.port, "/count", b)["count"] for b in bufs[:2]]
        np.testing.assert_allclose(got2, ref[:2], rtol=1e-5)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if _get(fleet.port, "/healthz")["status"] == "degraded":
                break
            time.sleep(0.5)
        assert _get(fleet.port, "/healthz")["status"] == "degraded"
    finally:
        fleet.shutdown()


def test_fleet_restart_respawns_dead_replica(tmp_path, monkeypatch):
    """--restart: the health loop respawns a killed replica process and
    it rejoins the rotation."""
    from dgvcc_tpu.serve_fleet import FleetServer

    monkeypatch.setenv("PYTHONPATH", os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    cfg = {
        "seed": 0, "version": "fleet_r", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None,
        "model": {"name": "mcnn", "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))

    fleet = FleetServer(str(p), replicas=1, port=0, restart=True,
                        probe_s=0.5)
    fleet.start(ready_timeout=300)
    try:
        rep = fleet.replicas[0]
        rep.proc.terminate()
        rep.proc.wait(timeout=10)
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if rep.restarts >= 1 and rep.probe():
                break
            time.sleep(1)
        assert rep.restarts >= 1 and rep.healthy
        assert _get(fleet.port, "/healthz")["status"] == "ok"
    finally:
        fleet.shutdown()


def test_fleet_validates_device_count(tmp_path):
    from dgvcc_tpu.serve_fleet import FleetServer

    with pytest.raises(ValueError, match="--devices"):
        FleetServer("cfg.yml", replicas=2, devices=["0"], port=0)


def test_fleet_rejects_artifact_with_auto():
    """--artifact + --quantize auto fails in the parent, not as N
    replica crash loops (the int8 artifact has no fp weights)."""
    from dgvcc_tpu.serve_fleet import FleetServer

    with pytest.raises(ValueError, match="auto"):
        FleetServer("cfg.yml", replicas=1, port=0, quantize="auto",
                    artifact="model.npz")


def test_fleet_quantize_auto_propagates_to_replica_cmd():
    """--quantize auto reaches each replica's CLI verbatim (the replica
    then picks int8 vs bf16 per dispatch, serve.py auto mode)."""
    from dgvcc_tpu.serve_fleet import FleetServer

    fleet = FleetServer("cfg.yml", replicas=1, port=0, quantize="auto")
    try:
        cmd = fleet.replicas[0].make_cmd(1234)
        i = cmd.index("--quantize")
        assert cmd[i + 1] == "auto"
        # plain int8 stays a bare flag
        fleet2 = FleetServer("cfg.yml", replicas=1, port=0, quantize=True)
        try:
            cmd2 = fleet2.replicas[0].make_cmd(1234)
            assert "--quantize" in cmd2 and "auto" not in cmd2
        finally:
            fleet2._httpd.server_close()
    finally:
        fleet._httpd.server_close()


def test_fleet_stats_monotonic_across_death_and_respawn():
    """Aggregate /stats never goes backwards: a dead replica keeps
    contributing its last-seen totals, and a respawn folds them into
    the retired base before the fresh process restarts from zero."""
    from dgvcc_tpu.serve_fleet import FleetServer

    fleet = FleetServer("cfg.yml", replicas=2, port=0)
    try:
        a, b = fleet.replicas
        a.last_stats = {"frames": 10, "batches": 5, "device_s": 1.0}
        b.last_stats = {"frames": 4, "batches": 2, "device_s": 0.5}
        # neither is healthy (no live processes) — totals come from the
        # last-seen values, NOT zero
        total = fleet._aggregate_stats()
        assert total["frames"] == 14 and total["batches"] == 7
        assert total["replicas"] == []  # no live detail, totals intact

        # respawn folds the dead incarnation into the retired base
        a.make_cmd = lambda port: ["sleep", "5"]
        old_port = a.port
        a.respawn()
        try:
            assert a.retired["frames"] == 10
            assert a.last_stats["frames"] == 0
            assert a.port != old_port
            assert a.restarts == 1
            assert fleet._aggregate_stats()["frames"] == 14  # monotonic
        finally:
            a.stop()
    finally:
        fleet._httpd.server_close()


def test_fleet_shutdown_before_serving_does_not_hang():
    """shutdown() on a fleet whose proxy never started serving must
    return (BaseServer.shutdown would otherwise wait forever) and must
    not raise — the startup-failure cleanup path relies on it."""
    import threading

    from dgvcc_tpu.serve_fleet import FleetServer

    fleet = FleetServer("cfg.yml", replicas=1, port=0)
    done = threading.Event()

    def run():
        fleet.shutdown()
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(timeout=10), "shutdown() hung on a never-served fleet"


def test_fleet_startup_failure_stops_replicas(tmp_path):
    """A replica command that exits immediately must fail _wait_ready
    with the exit codes AND leave no live child processes behind."""
    from dgvcc_tpu.serve_fleet import FleetServer

    fleet = FleetServer(str(tmp_path / "missing.yml"), replicas=2, port=0)
    # missing config -> the CLI exits at startup on both replicas
    with pytest.raises(RuntimeError, match="exited before becoming ready"):
        fleet.start(ready_timeout=60)
    assert all(not rep.alive() for rep in fleet.replicas)


def test_cli_rejects_pair_ckpt_for_serve_tasks(tmp_path):
    """--task serve/quantize/aot take one checkpoint path; the joint
    [gen, reg] comma form must error clearly instead of crashing deep
    in from_checkpoint."""
    import yaml as _yaml

    from dgvcc_tpu.cli.main import run

    cfg = {"version": "pair_serve", "device": "cpu",
           "model": {"name": "mcnn", "params": {}},
           "loss": {"name": "mse", "params": {}},
           "optimizer": {"name": "adam", "params": {"lr": 1e-3}},
           "mode": "simple", "num_epochs": 1,
           "log_dir": str(tmp_path / "logs")}
    p = tmp_path / "c.yml"
    p.write_text(_yaml.safe_dump(cfg))
    with pytest.raises(SystemExit, match="single checkpoint"):
        run(str(p), "serve", ckpt="a_gen.ckpt,a_reg.ckpt")
