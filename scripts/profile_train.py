"""Train-step attribution for DG 'final' (VERDICT r4 item 3).

Ablation-based bucket attribution of the ~116 ms fused train step
(320^2, B=16, bf16, two views): each variant removes one bucket from
the SAME jitted program and the delta attributes its cost. Buckets:

  * optimizer     — full step vs value_and_grad only (no adamw/update)
  * backward      — value_and_grad vs loss-value-only forward
  * err/mask/drop — the instance-norm + error-mask + masked-dropout
                    chain between decoder and memory
                    (models/dg.py:319-331), folded away by patching
                    instance_norm -> zeros (XLA constant-folds the
                    mask to 1) and dropout2d -> identity
  * innorm-f32    — same chain but computed in bf16 instead of the
                    reference's f32 (the candidate mixed-precision
                    rewrite): measures what the f32 casts cost
  * innorm-only   — instance_norm -> identity (keeps mask+dropout):
                    isolates the per-(B,C) spatial reductions

Protocol: K scanned steps per dispatch, readback-synced, relay-RTT
subtracted, median of 5 (same as bench.py). Also dumps the XLA cost
analysis (FLOP + HBM bytes) of the full step for the MFU table.

Usage: python scripts/profile_train.py [--batch 16] [--hw 320] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=320)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny DG geometry (CPU smoke; timings meaningless)")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dgvcc_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import dgvcc_tpu.losses  # noqa: F401
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.models.dg as dgmod
    from dgvcc_tpu.core.registry import LOSSES, MODELS
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.state import create_train_state
    from dgvcc_tpu.train.steps import build_loss_fn, build_train_step

    B, HW, K = args.batch, args.hw, args.k
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return x.astype(jnp.float32).sum()

    probe = jnp.asarray(rng.normal(size=(B, HW, HW, 3)), jnp.bfloat16)
    float(trivial(probe))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(json.dumps({"row": "rtt", "value_s": round(rtt, 4)}), flush=True)

    model_kw = {}
    if args.tiny:
        from dgvcc_tpu.testing import TINY_MEM

        model_kw = dict(TINY_MEM)
    model = MODELS.build("final", dtype=jnp.bfloat16, **model_kw)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, HW, HW, 3)), tx)
    loss = LOSSES.build("mse")
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, HW, HW, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, HW, HW, 3)), jnp.float32),
        "dmap": jnp.asarray(rng.uniform(0, 0.01, (B, HW, HW, 1)),
                            jnp.float32),
        "bmap": jnp.asarray((rng.uniform(size=(B, HW // 16, HW // 16, 1))
                             > 0.5), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    real_innorm = dgmod.instance_norm
    real_drop = dgmod.dropout2d

    # identical protocol to bench_debt: time K-step dispatch+readback
    def timed(step_like, state_arg):
        @partial(jax.jit, donate_argnums=0)
        def run_k(s, b):
            def body(c, i):
                out = step_like(c, b, jax.random.fold_in(key, i))
                return out[0], jax.tree.leaves(out[1])[0]
            s2, ms = jax.lax.scan(body, s, jnp.arange(K))
            return s2, ms[-1]

        # donate a COPY so `state` survives for the next variant
        s = jax.tree.map(jnp.copy, state_arg)
        s, l0 = run_k(s, batch)
        float(l0)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            s, l0 = run_k(s, batch)
            float(l0)
            ts.append(time.perf_counter() - t0)
        del s
        return max((float(np.median(ts)) - rtt) / K, 1e-6) * 1e3

    results = {}

    def emit(tag, ms, note=""):
        results[tag] = ms
        print(json.dumps({"row": tag, "ms_per_step": round(ms, 2),
                          "note": note}), flush=True)

    def full_step():
        step = build_train_step(model, loss, "final", 1000.0)

        def like(s, b, r):
            s2, m = step(s, b, r, jnp.int32(0))
            return s2, m["loss_total"]
        return like

    def grads_only():
        loss_fn = build_loss_fn(model, loss, "final", 1000.0)

        def like(s, b, r):
            (total, (nbs, m)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(s.params, s.batch_stats, b, r,
                                       jnp.int32(0))
            # fold grads into the carried loss so nothing is dead code,
            # but skip the optimizer entirely
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            s2 = s.replace(batch_stats=nbs)
            return s2, total + 0.0 * gsum
        return like

    def fwd_only():
        loss_fn = build_loss_fn(model, loss, "final", 1000.0)

        def like(s, b, r):
            total, (nbs, m) = loss_fn(s.params, s.batch_stats, b, r,
                                      jnp.int32(0))
            return s.replace(batch_stats=nbs), total
        return like

    want = args.variants

    def run(tag, builder, note=""):
        if want and tag not in want:
            return
        try:
            emit(tag, timed(builder(), state), note)
        except Exception as e:
            print(json.dumps({"row": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    run("full", full_step, "fwd x2 + losses + bwd + adamw")
    run("grads_only", grads_only, "no optimizer update")
    run("fwd_only", fwd_only, "no backward")

    # --- err/mask/dropout chain ablations (patch, rebuild, restore) ---
    def patched(tag, innorm=None, drop=None, note=""):
        if want and tag not in want:
            return
        try:
            if innorm is not None:
                dgmod.instance_norm = innorm
            if drop is not None:
                dgmod.dropout2d = drop
            emit(tag, timed(full_step(), state), note)
        except Exception as e:
            print(json.dumps({"row": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            dgmod.instance_norm = real_innorm
            dgmod.dropout2d = real_drop

    patched("chain_folded",
            innorm=lambda x: jnp.zeros_like(x),
            drop=lambda x, p, r: x,
            note="instance-norm/mask/dropout chain constant-folded away")
    patched("innorm_identity", innorm=lambda x: x,
            note="mask+dropout kept; the per-(B,C) IN reductions removed")
    patched("innorm_bf16",
            innorm=lambda x: real_innorm(x.astype(jnp.bfloat16)),
            note="chain in bf16 instead of f32 (mixed-precision candidate)")
    patched("dropout_identity", drop=lambda x, p, r: x,
            note="masked dropout removed (mask multiply kept)")

    # --- per-stage BACKWARD attribution via stop-gradient ablation ----
    # fwd_only showed the step is ~87% backward; these variants cut the
    # backward off at stage boundaries (stop_gradient on a stage's
    # output kills that stage's and all upstream wgrad/dgrad work while
    # the forward is unchanged), so deltas attribute bwd per stage.
    from dgvcc_tpu.nn import vgg as vggmod

    orig_vgg_call = vggmod.VGGFeatures.__call__

    def sg_variant(tag, sg_names, note):
        if want and tag not in want:
            return

        def patched_call(self, x, train=False):
            y = orig_vgg_call(self, x, train)
            if self.name in sg_names:
                y = jax.lax.stop_gradient(y)
            return y

        try:
            vggmod.VGGFeatures.__call__ = patched_call
            emit(tag, timed(full_step(), state), note)
        except Exception as e:
            print(json.dumps({"row": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            vggmod.VGGFeatures.__call__ = orig_vgg_call

    sg_variant("sg_enc1", {"enc1"},
               "no bwd through stage-1 (64ch, full-res) — delta = its "
               "wgrad+dgrad cost")
    sg_variant("sg_enc12", {"enc1", "enc2"},
               "no bwd through stages 1-2")
    sg_variant("sg_enc_all", {"enc1", "enc2", "enc3"},
               "encoder fwd only; bwd covers decoder+heads+chain")

    # --- decoder bwd isolation: stop_gradient on forward_fe's outputs
    # (y_cat AND x3) kills encoder+decoder+concat/upsample backward but
    # keeps the heads/memory/chain backward; sg_enc_all minus this =
    # the decoder-side backward alone.
    def sg_fe(tag="sg_fe"):
        if want and tag not in want:
            return
        orig_fe = dgmod.DGModel.forward_fe

        def patched_fe(self, x, train=False):
            y_cat, x3 = orig_fe(self, x, train)
            return (jax.lax.stop_gradient(y_cat),
                    jax.lax.stop_gradient(x3))

        try:
            dgmod.DGModel.forward_fe = patched_fe
            emit(tag, timed(full_step(), state),
                 "no bwd through encoder+decoder (heads/mem/chain only)")
        except Exception as e:
            print(json.dumps({"row": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            dgmod.DGModel.forward_fe = orig_fe

    sg_fe()

    # --- memory-bank training cost (fwd+bwd of the two-view attention
    # + consistency loss): MemoryBank -> identity with zero logits.
    # The (B, P, S) f32 logits of BOTH views (and their softmax/JSD/
    # backward rematerializations) vanish, so the delta bounds what a
    # logits-free fused training kernel could recover.
    def mem_identity(tag="mem_identity"):
        if want and tag not in want:
            return
        from dgvcc_tpu.models.dg import MemoryBank

        orig = MemoryBank.__call__

        def patched(self, y, need_logits=True):
            # logits stand-in: (B, 1, 1) zeros — jsd/consistency
            # constant-folds, attention disappears
            return y, jnp.zeros((y.shape[0], 1, 1), jnp.float32)

        try:
            MemoryBank.__call__ = patched
            emit(tag, timed(full_step(), state),
                 "memory attention + consistency loss removed")
        except Exception as e:
            print(json.dumps({"row": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            MemoryBank.__call__ = orig

    mem_identity()

    # --- XLA cost analysis of the full step ---------------------------
    if not want or "cost" in want:
        try:
            step = build_train_step(model, loss, "final", 1000.0)
            lowered = jax.jit(step).lower(state, batch, key, jnp.int32(0))
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", 0.0)
            bytes_ = ca.get("bytes accessed", 0.0)
            print(json.dumps({"row": "cost_analysis",
                              "tflop_per_step": round(flops / 1e12, 3),
                              "hbm_gb_per_step": round(bytes_ / 2**30, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"row": "cost_analysis",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    if results:
        print(json.dumps({"row": "summary", **{k: round(v, 2)
                                               for k, v in results.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
