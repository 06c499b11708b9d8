#!/usr/bin/env python
"""Multi-experiment launcher — the reference's train*.sh role
(/root/reference/train.sh:8-10: CUDA_VISIBLE_DEVICES=K python main.py
--task train_test --config X, sequentially per GPU).

TPU analog: each experiment is one process owning one chip (or a chip
subset via a visible-devices mask). Queued configs run in order, each
dispatched to the first device that frees up (at most one process per
device at a time); with no --devices they run sequentially on the
default device, exactly like the reference script.

--supervise N adds crash recovery: a run that exits non-zero (OOM,
preempted host, loader error, segfault) is re-enqueued up to N times,
auto-resuming from its own rolling `last.ckpt` (joint mode: the
`last_gen/last_reg` pair) when one exists — the trainer checkpoints
full state (params + optimizer + epoch + best), so the retry continues
from the last completed epoch rather than restarting. The reference has
no recovery story at all (crash = rerun by hand from `last.pth`,
weights only).

Usage:
  python scripts/launch.py --task train_test configs/sta_final.yml configs/sta_base.yml
  python scripts/launch.py --task train --devices 0,1,2,3 configs/*.yml
  python scripts/launch.py --supervise 3 --task train configs/sta_final.yml
  python scripts/launch.py --dry-run --devices 0,1 a.yml b.yml c.yml
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgvcc_tpu.utils.devices import chip_env as build_env  # noqa: E402


def resume_ckpt(cfg_path: str) -> str | None:
    """The run's own rolling checkpoint, if it got far enough to write
    one: {log_dir}/{version}/last.ckpt, or the last_gen/last_reg pair
    for joint mode (returned comma-joined — the CLI splits it back into
    the [gen, reg] list form)."""
    import yaml

    try:
        with open(cfg_path) as f:
            c = yaml.safe_load(f) or {}
    except OSError:
        return None
    d = os.path.join(c.get("log_dir", "logs"), c.get("version", "debug"))
    pair = [os.path.join(d, f"last_{k}.ckpt") for k in ("gen", "reg")]
    if all(os.path.exists(p) for p in pair):
        return ",".join(pair)
    p = os.path.join(d, "last.ckpt")
    return p if os.path.exists(p) else None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("configs", nargs="+", help="config YAML paths")
    ap.add_argument("--task", default="train_test",
                    choices=["train", "test", "train_test", "vis", "generate"])
    ap.add_argument("--devices", default=None,
                    help="comma-separated device ids; one process per id "
                         "at a time (omit = sequential on the default device)")
    ap.add_argument("--ckpt", default=None, help="checkpoint forwarded to every run")
    ap.add_argument("--supervise", type=int, default=0, metavar="N",
                    help="restart a failed run up to N times, resuming "
                         "from its last.ckpt when one exists")
    ap.add_argument("--dry-run", action="store_true", help="print the plan only")
    args = ap.parse_args(argv)

    devices = args.devices.split(",") if args.devices else [None]
    queue = [(cfg, 0) for cfg in args.configs]  # (config, attempt)
    running: dict[str, tuple] = {}  # device -> (proc, config, attempt)
    failures = []

    def cmd_for(cfg_path, resume=None):
        cmd = [sys.executable, "-m", "dgvcc_tpu.cli.main",
               "--task", args.task, "--config", cfg_path]
        ckpt = resume if resume is not None else args.ckpt
        if ckpt:
            cmd += ["--ckpt", ckpt]
        return cmd

    if args.dry_run:
        # device placement is first-free at run time, not a static
        # assignment — the plan shows queue order and the device pool
        pool = ",".join(d if d is not None else "default" for d in devices)
        print(f"[launch] device pool: [{pool}] (first-free scheduling)")
        for i, (cfg, _) in enumerate(queue):
            print(f"[queue {i}] " + " ".join(cmd_for(cfg)))
        return 0

    while queue or running:
        # reap finished
        for dev in list(running):
            proc, cfg, attempt = running[dev]
            if proc.poll() is not None:
                del running[dev]
                status = "ok" if proc.returncode == 0 else f"FAILED rc={proc.returncode}"
                print(f"[launch] {cfg} on {dev or 'default'}: {status}",
                      flush=True)
                if proc.returncode != 0:
                    if attempt < args.supervise:
                        r = resume_ckpt(cfg)
                        print(f"[launch] supervising {cfg}: restart "
                              f"{attempt + 1}/{args.supervise}"
                              + (f", resuming from {r}" if r else
                                 " from scratch (no last.ckpt yet)"),
                              flush=True)
                        queue.insert(0, (cfg, attempt + 1))
                    else:
                        failures.append(cfg)
        # fill free devices
        for dev in devices:
            key = dev if dev is not None else "default"
            if queue and key not in running:
                cfg, attempt = queue.pop(0)
                resume = resume_ckpt(cfg) if attempt > 0 else None
                proc = subprocess.Popen(cmd_for(cfg, resume),
                                        env=build_env(dev))
                print(f"[launch] starting {cfg} on {key} pid={proc.pid}",
                      flush=True)
                running[key] = (proc, cfg, attempt)
        if running:
            time.sleep(2)

    if failures:
        print(f"[launch] {len(failures)} run(s) failed: {failures}",
              file=sys.stderr)
        return 1
    print(f"[launch] all {len(args.configs)} run(s) completed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
