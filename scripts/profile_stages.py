"""Stage-attribution profiler for the DG serving path on real TPU.

Times truncated pipelines (encoder → +decoder → +den_dec → +memory →
full) with the readback-synced protocol (through the axon relay,
block_until_ready does not wait; every timed call reads back a scalar
and the measured trivial-readback RTT is subtracted). The deltas
attribute per-frame time to each stage — this produced the numbers in
BENCH_NOTES.md ("Int8 PTQ serving path" section).

Usage:
    python scripts/profile_stages.py [--batch 16] [--hw 768 1024]
                                     [--quant] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--hw", type=int, nargs=2, default=(768, 1024))
    parser.add_argument("--iters", type=int, default=8,
                        help="model invocations fused per dispatch")
    parser.add_argument("--quant", action="store_true",
                        help="profile the int8 PTQ graph instead of bf16")
    parser.add_argument("--cpu", action="store_true",
                        help="CPU backend (smoke-testing; timings are "
                             "meaningless). The env var alone is ignored "
                             "— this image pins the axon TPU platform.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dgvcc_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401

    (H, W), B, K = args.hw, args.batch, args.iters
    # the fused Pallas attention only runs on TPU hardware
    model = MODELS.build("final", dtype=jnp.bfloat16,
                         fused_mem=not args.cpu)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3), jnp.bfloat16))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32),
                         jnp.bfloat16)

    if args.quant:
        from dgvcc_tpu.nn.quant import QuantizedDG

        calib = jnp.asarray(
            rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
        q = QuantizedDG.from_model(model, variables, calib,
                                   fused_mem=not args.cpu)

        from dgvcc_tpu.nn.layers import upsample as _up

        def m_enc(f):
            x1, x2, x3 = q._encoder(q.qparams, f.astype(q.dtype))
            return sum(t.astype(jnp.float32).sum() for t in (x1, x2, x3))

        def _dec(qp, f):
            # mirrors QuantizedDG._forward's decoder block exactly
            x1, x2, x3 = q._encoder(qp, f.astype(q.dtype))
            y = q._qconv(qp, x3, "dec3_0")
            y = q._qconv(qp, y, "dec3_1")
            y3 = y
            y = q._qconv(qp, [_up(y, 2), x2], "dec2_0")
            y = q._qconv(qp, y, "dec2_1")
            y2 = y
            y = q._qconv(qp, [_up(y, 2), x1], "dec1_0")
            y = q._qconv(qp, y, "dec1_1")
            return y, y2, y3, x3

        def m_dec(f):
            y1, y2, y3, x3 = _dec(q.qparams, f)
            return sum(t.astype(jnp.float32).sum() for t in (y1, y2, y3, x3))

        def m_dendec(f):
            y1, y2, y3, x3 = _dec(q.qparams, f)
            y_den = q._qconv(q.qparams,
                             [y1, _up(y2, 2), _up(y3, 4)], "den_dec")
            return (y_den.astype(jnp.float32).sum()
                    + x3.astype(jnp.float32).sum())

        def m_full(f):
            d, c = q._forward(q.qparams, f)
            return d.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()

        stages = [("enc", m_enc), ("+dec", m_dec), ("+den_dec", m_dendec),
                  ("full", m_full)]
    else:
        def m_enc(f):
            def run(self, x):
                x1 = self.enc1(x, False)
                x2 = self.enc2(x1, False)
                x3 = self.enc3(x2, False)
                return sum(t.astype(jnp.float32).sum() for t in (x1, x2, x3))
            return model.apply(variables, f, method=run)

        def m_fe(f):
            def run(self, x):
                y_cat, x3 = self.forward_fe(x, train=False)
                return (y_cat.astype(jnp.float32).sum()
                        + x3.astype(jnp.float32).sum())
            return model.apply(variables, f, method=run)

        def m_fe_den(f):
            def run(self, x):
                y_cat, x3 = self.forward_fe(x, train=False)
                y = self._den_features(y_cat, False)
                return (y.astype(jnp.float32).sum()
                        + x3.astype(jnp.float32).sum())
            return model.apply(variables, f, method=run)

        def m_fe_den_mem(f):
            def run(self, x):
                y_cat, x3 = self.forward_fe(x, train=False)
                y = self._den_features(y_cat, False)
                y, _ = self.memory(y, need_logits=False)
                return (y.astype(jnp.float32).sum()
                        + x3.astype(jnp.float32).sum())
            return model.apply(variables, f, method=run)

        def m_full(f):
            d, c = model.apply(variables, f)
            return d.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()

        stages = [("enc", m_enc), ("+dec", m_fe), ("+den_dec", m_fe_den),
                  ("+mem", m_fe_den_mem), ("full", m_full)]

    @jax.jit
    def trivial(x):
        return x.astype(jnp.float32).sum()

    float(trivial(frames))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(frames))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt * 1e3:.1f} ms")

    prev = 0.0
    for tag, meth in stages:
        @jax.jit
        def run_k(fr, meth=meth):
            def body(f, _):
                s = meth(f)
                return f + (s * 1e-12).astype(f.dtype), s
            _, ss = jax.lax.scan(body, fr, None, length=K)
            return ss.sum()

        float(run_k(frames))  # compile + sync
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run_k(frames))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) - rtt
        per_frame = t / (B * K) * 1e3
        print(f"{tag:10s} {t * 1e3:8.1f} ms/{K}x  {per_frame:6.2f} ms/frame"
              f"  (+{per_frame - prev:5.2f})  {B * K / t:7.1f} fps")
        prev = per_frame


if __name__ == "__main__":
    main()
