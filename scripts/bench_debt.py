"""Queued TPU measurements (BENCH_NOTES.md relay note, VERDICT r3 item 2/4).

Pays the round-3 measurement debt on the real chip, one JSON line per
row (protocol identical to bench.py: K-chained dispatches, relay-RTT
subtraction, median of 5):

  * dssinet / cctrans serving fps, bf16 and selective-int8 (768x1024, B=8)
  * B=1 serving latency, DGModel 'final' bf16 + int8 (768x1024)
  * classic-family train ms/step (mode 'simple', 320^2, B=16, bf16)
  * DGModel 'final' train ms/step re-check (post TorchBatchNorm fix)
  * batched_two_view on/off train ms/step (VERDICT item 4)

Usage: python scripts/bench_debt.py [row ...]   (default: all rows)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_watchdog = [None]


def _arm_watchdog():
    import threading

    # per-row budget; raise for rows whose host-side PTQ build alone
    # exceeds 20 min on a 1-core host (cctrans int8 does)
    budget = float(os.environ.get("BENCH_DEBT_WATCHDOG_S", "1200"))

    def _die():
        print(f"bench_debt watchdog: no progress {budget:.0f} s — relay "
              "likely down", file=sys.stderr, flush=True)
        os._exit(3)

    if _watchdog[0] is not None:
        _watchdog[0].cancel()
    _watchdog[0] = threading.Timer(budget, _die)
    _watchdog[0].daemon = True
    _watchdog[0].start()


def emit(row):
    print(json.dumps(row), flush=True)
    _arm_watchdog()  # progress-based: reset on every completed row


def main(selected):
    _arm_watchdog()

    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from dgvcc_tpu.core.registry import MODELS, LOSSES
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.losses  # noqa: F401

    rng = np.random.default_rng(0)

    # relay RTT on a trivial readback (same protocol as bench.py)
    @jax.jit
    def trivial(x):
        return x.sum()

    probe = jnp.asarray(rng.normal(size=(8, 768, 1024, 3)), jnp.bfloat16)
    np.asarray(trivial(probe))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    emit({"row": "rtt", "value_s": round(rtt, 4)})

    def timed(fn, *args, n=5):
        np.asarray(fn(*args))  # compile + sync
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - rtt, 1e-6)

    def serve_fps(name, B, H=768, W=1024, K=8, quant=False):
        model = MODELS.build(name, dtype=jnp.bfloat16)
        x0 = jnp.zeros((1, H, W, 3), jnp.bfloat16)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x0)
        frames = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
        if quant:
            from dgvcc_tpu.nn.quant import build_quantized

            calib = jnp.asarray(rng.normal(size=(2, 256, 256, 3)),
                                jnp.float32)
            q = build_quantized(model, variables, calib)

            @jax.jit
            def infer_k(qparams, f):
                def body(f, _):
                    d = q._forward(qparams, f)
                    d = d[0] if isinstance(d, tuple) else d
                    c = jnp.sum(d.astype(jnp.float32), axis=(1, 2, 3))
                    return f + (c.sum() * 1e-12).astype(f.dtype), c
                _, cs = jax.lax.scan(body, f, None, length=K)
                return cs

            arg = q.qparams
        else:
            @jax.jit
            def infer_k(v, f):
                def body(f, _):
                    d = model.apply(v, f)
                    d = d[0] if isinstance(d, tuple) else d
                    c = jnp.sum(d.astype(jnp.float32), axis=(1, 2, 3))
                    return f + (c.sum() * 1e-12).astype(f.dtype), c
                _, cs = jax.lax.scan(body, f, None, length=K)
                return cs

            arg = variables
        dt = timed(infer_k, arg, frames)
        return B * K / dt, dt / (B * K) * 1e3

    def train_ms(name, mode="simple", B=16, HW=320, K=8, **model_kw):
        from dgvcc_tpu.train.state import create_train_state
        from dgvcc_tpu.train.optim import build_optimizer
        from dgvcc_tpu.train.steps import build_train_step

        model = MODELS.build(name, dtype=jnp.bfloat16, **model_kw)
        tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, HW, HW, 3)), tx)
        # probe the output stride so dmap matches the head resolution
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.zeros((1, HW, HW, 3), jnp.bfloat16))
        out = out[0] if isinstance(out, tuple) else out
        oh, ow = out.shape[1], out.shape[2]
        loss = LOSSES.build("mse")
        step = build_train_step(model, loss, mode, 1000.0)
        batch = {
            "img1": jnp.asarray(rng.normal(size=(B, HW, HW, 3)), jnp.float32),
            "dmap": jnp.asarray(rng.uniform(0, 0.01, (B, oh, ow, 1)),
                                jnp.float32),
        }
        if mode in ("final", "base", "add", "cls"):
            batch["img2"] = jnp.asarray(
                rng.normal(size=(B, HW, HW, 3)), jnp.float32)
            batch["dmap"] = jnp.asarray(
                rng.uniform(0, 0.01, (B, HW, HW, 1)), jnp.float32)
            batch["bmap"] = jnp.asarray(
                (rng.uniform(size=(B, HW // 16, HW // 16, 1)) > 0.5),
                jnp.float32)
        key = jax.random.PRNGKey(1)

        @partial(jax.jit, donate_argnums=0)
        def step_k(state, batch):
            def body(c, i):
                s, m = step(c, batch, jax.random.fold_in(key, i),
                            jnp.int32(0))
                return s, m["loss_total"]
            state, losses = jax.lax.scan(body, state, jnp.arange(K))
            return state, losses[-1]

        state, l0 = step_k(state, batch)
        float(l0)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, l0 = step_k(state, batch)
            float(l0)
            ts.append(time.perf_counter() - t0)
        return max((float(np.median(ts)) - rtt) / K, 1e-6) * 1e3

    def want(row):
        return not selected or row in selected

    # ---- serving fps: dssinet / cctrans, bf16 + int8 -------------------
    for fam in ("dssinet", "cctrans"):
        for quant in (False, True):
            row = f"{fam}_{'int8' if quant else 'bf16'}_fps"
            if not want(row):
                continue
            try:
                fps, ms = serve_fps(fam, B=8, quant=quant)
                emit({"row": row, "fps": round(fps, 1),
                      "ms_per_frame": round(ms, 2), "B": 8,
                      "shape": "768x1024"})
            except Exception as e:
                emit({"row": row, "error": repr(e)[:300]})

    # ---- B=1 serving latency: DG final bf16 + int8 ---------------------
    for quant in (False, True):
        row = f"dgfinal_b1_{'int8' if quant else 'bf16'}_latency"
        if not want(row):
            continue
        try:
            fps, ms = serve_fps("final", B=1, quant=quant)
            emit({"row": row, "ms_per_frame": round(ms, 2),
                  "fps": round(fps, 1), "B": 1, "shape": "768x1024"})
        except Exception as e:
            emit({"row": row, "error": repr(e)[:300]})

    # ---- classic-family train rows --------------------------------------
    for fam in ("csrnet", "mcnn", "sasnet", "dssinet", "cctrans", "bl"):
        row = f"{fam}_train_ms"
        if not want(row):
            continue
        try:
            ms = train_ms(fam)
            emit({"row": row, "ms_per_step": round(ms, 1),
                  "img_per_s": round(16 / (ms / 1e3), 1), "B": 16,
                  "shape": "320x320", "mode": "simple"})
        except Exception as e:
            emit({"row": row, "error": repr(e)[:300]})

    # ---- DG final train re-check + batched_two_view A/B -----------------
    for btv in (False, True):
        row = "dgfinal_train_ms" + ("_batched2v" if btv else "")
        if not want(row):
            continue
        try:
            ms = train_ms("final", mode="final", batched_two_view=btv)
            emit({"row": row, "ms_per_step": round(ms, 1),
                  "img_per_s": round(16 / (ms / 1e3), 1), "B": 16,
                  "shape": "320x320", "batched_two_view": btv})
        except Exception as e:
            emit({"row": row, "error": repr(e)[:300]})

    if _watchdog[0] is not None:
        _watchdog[0].cancel()


if __name__ == "__main__":
    main(set(sys.argv[1:]))
