"""Optimizers and epoch-stepped LR schedulers.

The reference builds torch optimizers/schedulers from YAML
(/root/reference/main.py:80-102) and calls ``scheduler.step()`` once per
*epoch* (trainers/trainer.py:82-87) — even for OneCycleLR, which torch
designed for per-batch stepping; consequently only the first
``num_epochs`` points of the OneCycle curve are ever visited. We keep
that exact semantic: a scheduler is a pure ``lr(step_index)`` mirroring
the torch formulas, advanced once per epoch, and the optax optimizer is
wrapped in ``inject_hyperparams`` so the trainer can set the learning
rate between epochs without re-jitting.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax

from dgvcc_tpu.core.registry import OPTIMIZERS, SCHEDULERS


# --------------------------------------------------------------------------
# Optimizers (reference main.py:80-88: sgd / adam / adamw)
# --------------------------------------------------------------------------

def _sgd(lr: float = 0.01, momentum: float = 0.0, weight_decay: float = 0.0, **_):
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(learning_rate, momentum=momentum or None),
        )
    )(learning_rate=lr)
    return tx


def _adam(lr: float = 1e-3, weight_decay: float = 0.0, betas=(0.9, 0.999), eps: float = 1e-8, **_):
    # torch Adam's weight_decay is L2-added-to-grad, not decoupled
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps),
        )
    )(learning_rate=lr)
    return tx


def _adamw(lr: float = 1e-3, weight_decay: float = 1e-2, betas=(0.9, 0.999), eps: float = 1e-8, **_):
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        )
    )(learning_rate=lr)
    return tx


OPTIMIZERS.register("sgd", _sgd)
OPTIMIZERS.register("adam", _adam)
OPTIMIZERS.register("adamw", _adamw)


def build_optimizer(spec: Dict[str, Any]):
    """spec = {'name': ..., 'params': {...}} as in the reference YAML."""
    return OPTIMIZERS.build(spec["name"], **spec.get("params", {}))


# --------------------------------------------------------------------------
# Schedulers (reference main.py:90-102: step/multistep/cosine/plateau/onecycle)
# --------------------------------------------------------------------------

class Scheduler:
    """Epoch-stepped LR source. ``step(metric)`` advances one epoch and
    returns the LR to use for the *next* epoch; ``current_lr`` is the LR
    for the epoch about to run. Matches torch's convention that the
    constructor-time LR applies to epoch 0 and step() is called after
    each epoch."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.epoch = 0

    def lr_at(self, epoch: int) -> float:
        raise NotImplementedError

    @property
    def current_lr(self) -> float:
        return self.lr_at(self.epoch)

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        return self.current_lr

    def state_dict(self):
        return {"epoch": self.epoch}

    def load_state_dict(self, d):
        self.epoch = d["epoch"]


class StepLR(Scheduler):
    def __init__(self, base_lr, step_size: int, gamma: float = 0.1, **_):
        super().__init__(base_lr)
        self.step_size, self.gamma = step_size, gamma

    def lr_at(self, e):
        return self.base_lr * self.gamma ** (e // self.step_size)


class MultiStepLR(Scheduler):
    def __init__(self, base_lr, milestones, gamma: float = 0.1, **_):
        super().__init__(base_lr)
        self.milestones, self.gamma = sorted(milestones), gamma

    def lr_at(self, e):
        k = sum(1 for m in self.milestones if m <= e)
        return self.base_lr * self.gamma**k


class CosineLR(Scheduler):
    def __init__(self, base_lr, T_max: int, eta_min: float = 0.0, **_):
        super().__init__(base_lr)
        self.T_max, self.eta_min = T_max, eta_min

    def lr_at(self, e):
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * e / self.T_max)
        ) / 2


class PlateauLR(Scheduler):
    """torch ReduceLROnPlateau (mode='min'), epoch-stepped with the val
    criterion."""

    def __init__(self, base_lr, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0, **_):
        super().__init__(base_lr)
        self.factor, self.patience = factor, patience
        self.threshold, self.min_lr = threshold, min_lr
        self._lr = base_lr
        self.best = float("inf")
        self.bad = 0

    def lr_at(self, e):
        return self._lr

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        if metric is None:
            return self._lr
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self._lr = max(self._lr * self.factor, self.min_lr)
                self.bad = 0
        return self._lr

    def state_dict(self):
        return {"epoch": self.epoch, "lr": self._lr, "best": self.best, "bad": self.bad}

    def load_state_dict(self, d):
        self.epoch, self._lr, self.best, self.bad = d["epoch"], d["lr"], d["best"], d["bad"]


class OneCycleLR(Scheduler):
    """torch OneCycleLR (cos strategy), evaluated at integer step()
    counts. Because the reference steps it per epoch, `total_steps =
    epochs * steps_per_epoch` is far larger than the number of steps
    actually taken — preserved verbatim."""

    def __init__(self, base_lr=None, max_lr=None, epochs: int = 100,
                 steps_per_epoch: int = 1, total_steps: Optional[int] = None,
                 pct_start: float = 0.3, div_factor: float = 25.0,
                 final_div_factor: float = 1e4, **_):
        max_lr = max_lr if max_lr is not None else base_lr
        super().__init__(max_lr)
        self.total_steps = total_steps or epochs * steps_per_epoch
        self.pct_start = pct_start
        self.initial_lr = max_lr / div_factor
        self.max_lr = max_lr
        self.min_lr = self.initial_lr / final_div_factor

    @staticmethod
    def _annealing_cos(start, end, pct):
        return end + (start - end) / 2.0 * (math.cos(math.pi * pct) + 1)

    def lr_at(self, e):
        up = float(self.pct_start * self.total_steps) - 1
        if e <= up:
            return self._annealing_cos(self.initial_lr, self.max_lr, e / max(up, 1))
        down = float(self.total_steps - up - 1)
        return self._annealing_cos(self.max_lr, self.min_lr, (e - up) / max(down, 1))


SCHEDULERS.register("step", lambda base_lr, **kw: StepLR(base_lr, **kw))
SCHEDULERS.register("multistep", lambda base_lr, **kw: MultiStepLR(base_lr, **kw))
SCHEDULERS.register("cosine", lambda base_lr, **kw: CosineLR(base_lr, **kw))
SCHEDULERS.register("plateau", lambda base_lr, **kw: PlateauLR(base_lr, **kw))
SCHEDULERS.register("onecycle", lambda base_lr, **kw: OneCycleLR(base_lr, **kw))


def build_scheduler(spec: Optional[Dict[str, Any]], base_lr: float) -> Optional[Scheduler]:
    if spec is None:
        return None
    return SCHEDULERS.build(spec["name"], base_lr=base_lr, **spec.get("params", {}))
