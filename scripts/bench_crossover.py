"""Int8-vs-bf16 serving crossover table (VERDICT r4 item 1).

Measures DGModel 'final' serving fps at a (shape x batch) grid in both
precisions on the real chip, plus a tiny-shape floor sweep
(smallgrid), weight-only-int8 rows, and a single-conv microbenchmark.
Each grid point also reports whether serve.py's auto rule (batch dim
>= AUTO_INT8_MIN_BATCH and per-element pixels >=
AUTO_INT8_MIN_PIXELS) picks the measured-faster graph. This grid
drove the round-5 findings: the fused-attention batch routing bug,
the "int8 wins everywhere >=256^2" law, and the chaotic sub-256^2
tail (BENCH_NOTES round 5).

Protocol identical to bench.py / bench_debt.py: K dispatches fused in
one jit via lax.scan, readback-synced, relay-RTT subtracted, median
of 5. One JSON line per row so partial runs still produce data.

Usage:
    python scripts/bench_crossover.py [grid|weightonly|microconv] ...
    (default: all sections; BENCH_XOVER_WATCHDOG_S bounds per-row time)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (H, W) -> batches. 768x1024 gets the fine scan (the calibrated
# serving shape); 1088x1920 is the 1080p tile; big combos pruned to
# bound relay-compile wall time.
GRID = (
    ((512, 512), (1, 4, 8, 16)),
    ((768, 1024), (1, 2, 3, 4, 8, 16)),
    ((1088, 1920), (1, 2, 4)),
)

_watchdog = [None]


def _arm_watchdog():
    import threading

    budget = float(os.environ.get("BENCH_XOVER_WATCHDOG_S", "1500"))

    def _die():
        print(f"bench_crossover watchdog: no progress in {budget:.0f} s — "
              "relay likely down", file=sys.stderr, flush=True)
        os._exit(3)

    if _watchdog[0] is not None:
        _watchdog[0].cancel()
    _watchdog[0] = threading.Timer(budget, _die)
    _watchdog[0].daemon = True
    _watchdog[0].start()


def emit(row):
    print(json.dumps(row), flush=True)
    _arm_watchdog()


def main(selected):
    _arm_watchdog()

    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.core.registry import MODELS

    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return x.sum()

    probe = jnp.asarray(rng.normal(size=(4, 768, 1024, 3)), jnp.bfloat16)
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

    def want(section):
        return not selected or section in selected

    # one model + variables + quantized graph, shared across the grid
    # (activation scales are shape-independent per-site absmaxes).
    # fused_mem matches bench.py's bf16 headline config so the fp and
    # int8 graphs use the SAME Pallas memory attention — otherwise the
    # ratio would credit int8 with the +14% fused-attention win too.
    on_tpu = jax.default_backend() != "cpu"
    model = MODELS.build("final", dtype=jnp.bfloat16, fused_mem=on_tpu)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 256, 256, 3), jnp.bfloat16))
    from dgvcc_tpu.nn.quant import QuantizedDG

    calib = jnp.asarray(rng.normal(size=(2, 256, 256, 3)), jnp.float32)
    q = QuantizedDG.from_model(model, variables, calib)
    q_wo = QuantizedDG.from_model(model, variables, None, weight_only=True)

    def infer_k_factory(forward, K):
        @jax.jit
        def infer_k(arg, f):
            def body(f, _):
                d = forward(arg, f)
                d = d[0] if isinstance(d, tuple) else d
                c = jnp.sum(d.astype(jnp.float32), axis=(1, 2, 3))
                return f + (c.sum() * 1e-12).astype(f.dtype), c
            _, cs = jax.lax.scan(body, f, None, length=K)
            return cs
        return infer_k

    def variants_for(K):
        return {
            "bf16": (infer_k_factory(lambda v, f: model.apply(v, f), K),
                     variables),
            "int8": (infer_k_factory(q._forward, K), q.qparams),
        }

    def pick_k(B, H, W):
        # keep each timed dispatch well above the relay RTT (~25-30 ms)
        # or small-point medians flap on noise (the 512^2 B=1 flip,
        # BENCH_NOTES round 5): ~8 us/Mpx-frame-equivalent floor
        est_ms = B * H * W * 1.2e-5
        return int(min(64, max(4, round(150.0 / max(est_ms, 0.5)))))

    wo_fwd = infer_k_factory(q_wo._forward, 4)
    K = 4

    if want("grid"):
        from dgvcc_tpu.serve import (AUTO_INT8_MIN_BATCH,
                                     AUTO_INT8_MIN_PIXELS)

        for (H, W), batches in GRID:
            for B in batches:
                frames = jnp.asarray(
                    rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
                Kp = pick_k(B, H, W)
                res = {}
                for prec, (fn, arg) in variants_for(Kp).items():
                    try:
                        dt = timed(fn, arg, frames)
                        res[prec] = dt / (B * Kp) * 1e3  # ms/frame
                    except Exception as e:
                        emit({"row": "grid", "shape": f"{H}x{W}", "B": B,
                              "prec": prec,
                              "error": f"{type(e).__name__}: {e}"[:200]})
                if len(res) == 2:
                    px = B * H * W
                    auto_pick = ("int8"
                                 if (B >= AUTO_INT8_MIN_BATCH
                                     and H * W >= AUTO_INT8_MIN_PIXELS)
                                 else "bf16")
                    faster = min(res, key=res.get)
                    emit({"row": "grid", "shape": f"{H}x{W}", "B": B,
                          "px_per_dispatch": px,
                          "bf16_ms_per_frame": round(res["bf16"], 2),
                          "int8_ms_per_frame": round(res["int8"], 2),
                          "int8_speedup": round(res["bf16"] / res["int8"],
                                                3),
                          "faster": faster, "auto_pick": auto_pick,
                          "auto_correct": auto_pick == faster})
                del frames

    if want("smallgrid"):
        # tiny-frame floor sweep: B>=4 everywhere (the batch axis is
        # satisfied), pixels shrink — brackets AUTO_INT8_MIN_PIXELS
        for (H, W), batches in (((256, 256), (4, 8, 16)),
                                ((128, 128), (8, 16, 32))):
            for B in batches:
                frames = jnp.asarray(
                    rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
                Kp = pick_k(B, H, W)
                res = {}
                for prec, (fn, arg) in variants_for(Kp).items():
                    dt = timed(fn, arg, frames)
                    res[prec] = dt / (B * Kp) * 1e3
                emit({"row": "smallgrid", "shape": f"{H}x{W}", "B": B,
                      "px_per_dispatch": B * H * W,
                      "bf16_ms_per_frame": round(res["bf16"], 3),
                      "int8_ms_per_frame": round(res["int8"], 3),
                      "int8_speedup": round(res["bf16"] / res["int8"], 3),
                      "faster": min(res, key=res.get)})
                del frames

    if want("weightonly"):
        for B in (1, 4):
            H, W = 768, 1024
            frames = jnp.asarray(rng.normal(size=(B, H, W, 3)),
                                 jnp.bfloat16)
            dt = timed(wo_fwd, q_wo.qparams, frames)
            emit({"row": "weight_only", "shape": f"{H}x{W}", "B": B,
                  "ms_per_frame": round(dt / (B * K) * 1e3, 2)})
            del frames

    if want("microconv"):
        # attribute the small-batch int8 penalty: ONE 3x3 conv, same
        # total pixels arranged as B=1 vs B=16, int8 vs bf16. If int8
        # loses only at B=1, the penalty is an XLA int8-conv lowering
        # property, not our requantize chain.
        C = 256
        kb = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05,
                         jnp.bfloat16)
        k8 = jnp.asarray(
            np.clip(np.rint(rng.normal(size=(3, 3, C, C)) * 20), -127,
                    127), jnp.int8)
        dn = ("NHWC", "HWIO", "NHWC")

        # CHAINED convs (each iteration consumes the last output) so
        # XLA cannot hoist the loop-invariant conv out of the loop; the
        # int8 chain pays one int32->int8 cast per layer — the same
        # class of epilogue a real requantizing graph pays.
        def conv_chain(to_int8):
            def run(k, x):
                def body(i, x):
                    y = jax.lax.conv_general_dilated(
                        x, k, (1, 1), "SAME", dimension_numbers=dn,
                        preferred_element_type=(jnp.int32 if to_int8
                                                else None))
                    return (y.astype(jnp.int8) if to_int8
                            else y.astype(jnp.bfloat16))
                xn = jax.lax.fori_loop(0, 8, body, x)
                return jnp.sum(xn.astype(jnp.float32))
            return jax.jit(run)

        for B, h, w in ((1, 768, 1024), (16, 192, 256)):
            x_b = jnp.asarray(rng.normal(size=(B, h, w, C)), jnp.bfloat16)
            x_8 = jnp.asarray(
                np.clip(np.rint(rng.normal(size=(B, h, w, C)) * 20), -127,
                        127), jnp.int8)
            t_b = timed(conv_chain(False), kb, x_b) / 8
            t_8 = timed(conv_chain(True), k8, x_8) / 8
            emit({"row": "microconv", "B": B, "hw": f"{h}x{w}", "ch": C,
                  "bf16_ms": round(t_b * 1e3, 3),
                  "int8_ms": round(t_8 * 1e3, 3),
                  "int8_speedup": round(t_b / t_8, 3)})
            del x_b, x_8

    if _watchdog[0] is not None:
        _watchdog[0].cancel()


if __name__ == "__main__":
    main(set(sys.argv[1:]))
