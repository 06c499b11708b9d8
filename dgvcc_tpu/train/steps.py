"""Per-mode jitted train steps.

The reference dispatches its six training modes inside a Python trainer
(/root/reference/trainers/dgtrainer.py:143-209) with per-batch
host↔device traffic. Here each mode compiles to ONE fused XLA program:
forward(s), losses, backward, optimizer update, and (data-parallel)
gradient pmean all live under a single jit/shard_map.

Batches are dicts of device arrays with static shapes:
    img1 (B,H,W,3), img2 (B,H,W,3)?, dmap (B,H,W,1)?, bmap (B,H/16,W/16,1)?,
    points (B,N,2)?, pt_mask (B,N)?, targets (B,N)?, st_sizes (B,)?

Modes (parity with dgtrainer.py:149-204):
    simple  — one view, count loss
    base    — two views, count loss on both
    add     — model.forward_train → + consistency loss
    cls     — density + 10x BCE on the foreground classifier
    final   — forward_train → den + 10*BCE + 10*consistency [+ err]
    isw     — model returns [task_loss, wt_loss]; + 0.6*wt after epoch 5
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dgvcc_tpu.train.state import TrainState


def bce(pred_prob, target, eps: float = 1e-7):
    """F.binary_cross_entropy on probabilities (clamped like torch)."""
    p = jnp.clip(pred_prob.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def _count_loss(loss, pred, batch, log_para):
    """compute_count_loss dispatch (dgtrainer.py:50-69)."""
    if getattr(loss, "kind", "mse") == "mse":
        return loss(pred, batch["dmap"], log_para=log_para)
    # Bayesian loss consumes padded points/targets
    return loss(batch["points"], batch["pt_mask"], batch["targets"],
                batch["st_sizes"], pred)


def _first(out):
    return out[0] if isinstance(out, tuple) else out


def build_loss_fn(model, loss, mode: str, log_para: float,
                  con_weight: float = 10.0) -> Callable:
    """Returns loss_fn(params, batch_stats, batch, rng, epoch) →
    (total, (new_batch_stats, metrics)).

    con_weight: weight of the two-view consistency term in 'final' mode
    (10.0 in the reference, dgtrainer.py:189; the 'nocon' ablation sets
    it to 0 — the reference did that ablation by code edit, its
    sta_nocon.yml is otherwise identical to sta_final.yml)."""

    def apply(variables, *args, rng=None, method=None, **kwargs):
        out, mut = model.apply(
            variables, *args,
            method=method,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
            **kwargs,
        )
        return out, mut["batch_stats"]

    def loss_fn(params, batch_stats, batch, rng, epoch):
        variables = {"params": params, "batch_stats": batch_stats}
        metrics = {}

        if mode == "simple":
            out, nbs = apply(variables, batch["img1"], train=True, rng=rng)
            loss_den = _count_loss(loss, _first(out), batch, log_para)
            total = loss_den
            metrics["loss_den"] = loss_den

        elif mode == "base":
            r1, r2 = jax.random.split(rng)
            out1, nbs = apply(variables, batch["img1"], train=True, rng=r1)
            out2, nbs = apply({"params": params, "batch_stats": nbs},
                              batch["img2"], train=True, rng=r2)
            loss_den = (_count_loss(loss, _first(out1), batch, log_para)
                        + _count_loss(loss, _first(out2), batch, log_para))
            total = loss_den
            metrics["loss_den"] = loss_den

        elif mode == "add":
            (d1, d2, loss_con), nbs = apply(
                variables, batch["img1"], batch["img2"],
                method=model.forward_train, rng=rng,
            )
            loss_den = (_count_loss(loss, d1, batch, log_para)
                        + _count_loss(loss, d2, batch, log_para))
            total = loss_den + loss_con
            metrics.update(loss_den=loss_den, loss_con=loss_con)

        elif mode == "cls":
            r1, r2 = jax.random.split(rng)
            (d1, c1), nbs = apply(variables, batch["img1"],
                                  c_gt=batch["bmap"], train=True, rng=r1)
            (d2, c2), nbs = apply({"params": params, "batch_stats": nbs},
                                  batch["img2"], c_gt=batch["bmap"], train=True, rng=r2)
            loss_den = (_count_loss(loss, d1, batch, log_para)
                        + _count_loss(loss, d2, batch, log_para))
            loss_cls = bce(c1, batch["bmap"]) + bce(c2, batch["bmap"])
            total = loss_den + 10.0 * loss_cls
            metrics.update(loss_den=loss_den, loss_cls=loss_cls)

        elif mode == "final":
            out, nbs = apply(
                variables, batch["img1"], batch["img2"], batch["bmap"],
                method=model.forward_train, rng=rng,
            )
            dc1, dc2, c1, c2, c_err, loss_con, loss_err = out
            loss_den = (_count_loss(loss, dc1, batch, log_para)
                        + _count_loss(loss, dc2, batch, log_para))
            loss_cls = bce(c1, batch["bmap"]) + bce(c2, batch["bmap"])
            # err loss is computed but not added, mirroring dgtrainer.py:189
            total = loss_den + 10.0 * loss_cls + con_weight * loss_con
            metrics.update(loss_den=loss_den, loss_cls=loss_cls,
                           loss_con=loss_con, loss_err=loss_err)

        elif mode == "isw":
            # model returns [task_loss, wt_loss] when training; the
            # sensitive-covariance masks come in through the batch
            # (models/whitening.py IswCovTracker.mask_batch)
            out, nbs = apply(
                variables, batch["img1"],
                gts=batch["dmap"] * log_para,
                masks=batch.get("isw_masks"),
                num_sensitive=batch.get("isw_nums"),
                margins=batch.get("isw_margins"),
                apply_wtloss=epoch > 5,
                train=True, rng=rng,
            )
            task_loss, wt_loss = out
            apply_wt = (epoch > 5).astype(jnp.float32)
            total = task_loss + 0.6 * apply_wt * wt_loss
            metrics.update(loss_den=task_loss, loss_wt=wt_loss)

        else:
            raise ValueError(f"Unknown mode: {mode}")

        metrics["loss_total"] = total
        return total, (nbs, metrics)

    return loss_fn


def build_train_step(
    model,
    loss,
    mode: str,
    log_para: float,
    axis_name: Optional[str] = None,
    loss_fn: Optional[Callable] = None,
    con_weight: float = 10.0,
) -> Callable:
    """One fused train step: grads + (optional) cross-chip pmean + update.

    With ``axis_name`` set the step is meant to run inside shard_map over
    a data-parallel mesh axis: gradients AND updated batch stats are
    pmean'd — batch-stat averaging is the jax-collective replacement for
    the reference's torch SyncBatchNorm / SyncSwitchWhiten all_reduce
    (models/ISW/sync_switchwhiten.py:21-26).
    """
    loss_fn = loss_fn or build_loss_fn(model, loss, mode, log_para, con_weight)

    def step(state: TrainState, batch: Dict[str, Any], rng, epoch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, epoch
        )
        if axis_name is not None:
            # Under jax>=0.8 shard_map, grads of replicated params are
            # auto-psum'd across the mesh axis by the transpose rule —
            # divide by the axis size to get the DDP mean.
            n = lax.axis_size(axis_name)
            grads = jax.tree.map(lambda g: g / n, grads)
            new_bs = lax.pmean(new_bs, axis_name)
            metrics = lax.pmean(metrics, axis_name)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return state, metrics

    return step


def jit_train_step(step: Callable, donate: bool = True):
    return jax.jit(step, donate_argnums=(0,) if donate else ())
