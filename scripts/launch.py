#!/usr/bin/env python
"""Multi-experiment launcher — the reference's train*.sh role
(/root/reference/train.sh:8-10: CUDA_VISIBLE_DEVICES=K python main.py
--task train_test --config X, sequentially per GPU).

TPU analog: each experiment is one process owning one chip (or a chip
subset via a visible-devices mask). Queued configs run in order, each
dispatched to the first device that frees up (at most one process per
device at a time); with no --devices they run sequentially on the
default device, exactly like the reference script.

Usage:
  python scripts/launch.py --task train_test configs/sta_final.yml configs/sta_base.yml
  python scripts/launch.py --task train --devices 0,1,2,3 configs/*.yml
  python scripts/launch.py --dry-run --devices 0,1 a.yml b.yml c.yml
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def build_env(device: str | None) -> dict:
    env = dict(os.environ)
    if device is not None:
        # TPU processes claim every local chip by default; restrict each
        # worker to its slice (the TPU equivalent of CUDA_VISIBLE_DEVICES)
        env["TPU_VISIBLE_CHIPS"] = device
        env["TPU_PROCESS_BOUNDS"] = "1,1,1"
        env["CUDA_VISIBLE_DEVICES"] = device  # harmless on TPU; covers GPU hosts
    return env


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("configs", nargs="+", help="config YAML paths")
    ap.add_argument("--task", default="train_test",
                    choices=["train", "test", "train_test", "vis", "generate"])
    ap.add_argument("--devices", default=None,
                    help="comma-separated device ids; one process per id "
                         "at a time (omit = sequential on the default device)")
    ap.add_argument("--ckpt", default=None, help="checkpoint forwarded to every run")
    ap.add_argument("--dry-run", action="store_true", help="print the plan only")
    args = ap.parse_args(argv)

    devices = args.devices.split(",") if args.devices else [None]
    queue = list(args.configs)
    running: dict[str, tuple] = {}  # device -> (proc, config)
    failures = []

    def cmd_for(cfg_path):
        cmd = [sys.executable, "-m", "dgvcc_tpu.cli.main",
               "--task", args.task, "--config", cfg_path]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        return cmd

    if args.dry_run:
        # device placement is first-free at run time, not a static
        # assignment — the plan shows queue order and the device pool
        pool = ",".join(d if d is not None else "default" for d in devices)
        print(f"[launch] device pool: [{pool}] (first-free scheduling)")
        for i, cfg in enumerate(queue):
            print(f"[queue {i}] " + " ".join(cmd_for(cfg)))
        return 0

    while queue or running:
        # reap finished
        for dev in list(running):
            proc, cfg = running[dev]
            if proc.poll() is not None:
                del running[dev]
                status = "ok" if proc.returncode == 0 else f"FAILED rc={proc.returncode}"
                print(f"[launch] {cfg} on {dev or 'default'}: {status}",
                      flush=True)
                if proc.returncode != 0:
                    failures.append(cfg)
        # fill free devices
        for dev in devices:
            key = dev if dev is not None else "default"
            if queue and key not in running:
                cfg = queue.pop(0)
                print(f"[launch] starting {cfg} on {key}", flush=True)
                running[key] = (subprocess.Popen(cmd_for(cfg),
                                                 env=build_env(dev)), cfg)
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
