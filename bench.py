"""Headline benchmark: frames/sec/chip of per-frame density inference.

Workload: DGModel 'final' (the flagship DG counter) running whole-frame
density regression on 768x1024 frames — the video crowd-counting
serving path (BASELINE.json north star). Inference runs in bfloat16
(TPU-native precision for conv/matmul; density sums reduce in f32).

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md). The driver target is >=3x A100 frames/sec/chip. We
estimate the reference's A100 throughput from its compute profile:
DGModel_final forward at 768x1024 is ~0.9 TFLOP/frame; torch fp32
(no AMP in the reference for this model, trainers run fp32) on A100
(19.5 TFLOP/s fp32, ~45% conv efficiency) ~= 10 frames/s. Target =
3 x 10 = 30 frames/s. vs_baseline = measured_fps / 30.

Sensitivity of that estimate (VERDICT r3 item 8): at 220.6 fps/chip
(int8 serving, BENCH_r03) the 3x target stays beaten for ANY A100
estimate below 73.5 fps — i.e. even if the reference ran 7.3x faster
than our FLOP model says. 73.5 fps would require ~66 TFLOP/s effective
on a 19.5 TFLOP/s fp32 part, impossible without AMP/TF32 the reference
does not use (the only autocast in the tree is DSSINet's,
/root/reference/models/baselines/DSSINet.py:342 — not this model).
Even granting free TF32 (2x fp32 peak, same efficiency -> ~20 fps) the
margin is still 220.6/60 = 3.7x the target. The headline does not
hinge on the 10 fps guess.
"""

import json
import time

import numpy as np

A100_EST_FPS = 10.0
TARGET_MULTIPLIER = 3.0


def main():
    import os
    import sys
    import threading

    # watchdog: this container's TPU relay occasionally goes down in a
    # mode where NEW connections hang forever (no error). A hung bench
    # would stall the whole round-end pipeline — fail loudly instead.
    # PROGRESS-BASED: each completed milestone re-arms the timer, so a
    # slow-but-advancing run is tolerated while a genuine hang still
    # aborts within one budget of the last progress. A fixed-total
    # 900 s timer aborted a live run on 2026-08-19 mid-compile; that
    # night the relay's remote-compile of the single B=32 768x1024
    # graph alone exceeded 900 s (a B=4 probe took 162 s cold), so the
    # per-milestone default is 1800 s (override: BENCH_WATCHDOG_S).
    _timer = [None]
    budget = float(os.environ.get("BENCH_WATCHDOG_S", "1800"))

    def _die():
        print(f"bench.py watchdog: no progress for {budget:.0f} s — the "
              "TPU relay is likely down (new connections hang); aborting",
              file=sys.stderr, flush=True)
        os._exit(3)

    def tick(milestone):
        print(f"bench.py: {milestone}", file=sys.stderr, flush=True)
        if _timer[0] is not None:
            _timer[0].cancel()
        _timer[0] = threading.Timer(budget, _die)
        _timer[0].daemon = True
        _timer[0].start()

    tick("start")

    class _Watchdog:  # keep the single cancel() call site below working
        @staticmethod
        def cancel():
            if _timer[0] is not None:
                _timer[0].cancel()

    watchdog = _Watchdog()

    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.core.cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))

    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401

    H, W, B = 768, 1024, 32  # batch sweep on v5e (int8 serving):
    # B=16 200.7, B=24 175.3, B=32 204.6, B=48 182.8 fps — 32 wins
    # fused_mem: Pallas memory-bank attention, +14% over the einsum path
    model = MODELS.build("final", dtype=jnp.bfloat16, fused_mem=True)
    init_x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, init_x
    )
    tick("model initialized")

    def infer_one(variables, frames):
        d, _ = model.apply(variables, frames)
        # per-frame counts: the serving output (f32 reduction)
        return jnp.sum(d.astype(jnp.float32), axis=(1, 2, 3)) / 1000.0

    K = 8  # model invocations fused into one dispatch

    @jax.jit
    def infer_k(variables, frames):
        # chain K inferences with a data dependency so none can be elided;
        # one dispatch + one readback amortizes the tunnel round-trip
        def body(f, _):
            counts = infer_one(variables, f)
            f = f + (counts.sum() * 1e-12).astype(f.dtype)
            return f, counts
        _, counts = jax.lax.scan(body, frames, None, length=K)
        return counts

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32), jnp.bfloat16)

    # NOTE: through the axon relay, block_until_ready does not actually
    # wait for device completion — the only true sync is a host
    # readback. Each timed call therefore reads back the (tiny) counts.
    np.asarray(infer_k(variables, frames))  # compile + sync
    tick("bf16 serving graph compiled")

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(infer_k(variables, frames))
        times.append(time.perf_counter() - t0)
        tick("bf16 timed iteration")
    # subtract the measured tunnel round-trip (timed on a trivial readback)
    @jax.jit
    def trivial(x):
        return x.sum()
    np.asarray(trivial(frames))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(frames))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    compute = max(float(np.median(times)) - rtt, 1e-6)
    bf16_fps = B * K / compute

    # int8 PTQ serving graph (nn/quant.py): BN-fold + per-channel int8
    # weights + calibrated activation scales — the production serving
    # path (v5e runs int8 convs at ~2x the bf16 MXU rate; count error vs
    # bf16 is ~1%, tests/test_quant.py). Same protocol, same workload.
    from dgvcc_tpu.nn.quant import QuantizedDG

    calib = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    q = QuantizedDG.from_model(model, variables, calib)
    tick("int8 graph folded + calibrated")

    @jax.jit
    def infer_q_k(qparams, frames):
        def body(f, _):
            d, _c = q._forward(qparams, f)
            counts = jnp.sum(d.astype(jnp.float32), axis=(1, 2, 3)) / 1000.0
            f = f + (counts.sum() * 1e-12).astype(f.dtype)
            return f, counts
        _, counts = jax.lax.scan(body, frames, None, length=K)
        return counts

    np.asarray(infer_q_k(q.qparams, frames))  # compile + sync
    tick("int8 serving graph compiled")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(infer_q_k(q.qparams, frames))
        times.append(time.perf_counter() - t0)
        tick("int8 timed iteration")
    int8_fps = B * K / max(float(np.median(times)) - rtt, 1e-6)

    train_img_s, train_ms = bench_train(jax, jnp, rtt=rtt, tick=tick)
    fps = int8_fps  # the headline IS the int8 path — a regression here
    # must show in `value`, not hide behind the bf16 number
    print(json.dumps({
        "metric": "DGModel_final density inference frames/sec/chip "
                  "(768x1024; int8 PTQ serving graph, bf16 in fields)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / (A100_EST_FPS * TARGET_MULTIPLIER), 3),
        "bf16_fps": round(bf16_fps, 2),
        "int8_fps": round(int8_fps, 2),
        "train_img_per_s": round(train_img_s, 1),
        "train_ms_per_step": round(train_ms, 1),
    }))
    watchdog.cancel()


def bench_train(jax, jnp, rtt: float = 0.0, tick=lambda m: None):
    """Training throughput: mode 'final' full fused step (two-view
    forward + losses + backward + adamw update), 320^2 crops, B=16,
    bf16 — the production training shape (configs/sta_final.yml).
    Returns (img/s, ms/step)."""
    from dgvcc_tpu.core.registry import MODELS, LOSSES
    import dgvcc_tpu.losses  # noqa: F401
    from dgvcc_tpu.train.state import create_train_state
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.steps import build_train_step

    H = W = 320
    B = 16
    K = 8  # steps fused into one dispatch (amortizes the relay RTT,
    # same protocol as the inference bench above)
    model = MODELS.build("final", dtype=jnp.bfloat16)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), tx)
    loss = LOSSES.build("mse")
    step = build_train_step(model, loss, "final", 1000.0)

    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "img2": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "dmap": jnp.asarray(rng.uniform(0, 0.01, (B, H, W, 1)).astype(np.float32)),
        "bmap": jnp.asarray((rng.uniform(size=(B, H // 16, W // 16, 1)) > 0.5
                             ).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)

    from functools import partial

    @partial(jax.jit, donate_argnums=0)  # same memory behavior as the
    # trainer's donated step: input state buffers are reused
    def step_k(state, batch):
        def body(c, i):
            s, m = step(c, batch, jax.random.fold_in(key, i), jnp.int32(0))
            return s, m["loss_total"]
        state, losses = jax.lax.scan(body, state, jnp.arange(K))
        return state, losses[-1]

    state, l0 = step_k(state, batch)  # compile
    float(l0)  # true sync through the relay
    tick("train step compiled")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, l0 = step_k(state, batch)
        float(l0)  # one readback per K steps
        times.append(time.perf_counter() - t0)
        tick("train timed iteration")
    step_s = max((float(np.median(times)) - rtt) / K, 1e-6)
    return B / step_s, step_s * 1e3


if __name__ == "__main__":
    main()
