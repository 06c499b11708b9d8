"""Train state: params + batch_stats + optimizer state, one pytree.

Unlike the reference (which checkpoints model weights only —
trainers/trainer.py:46-47), the full state including optimizer moments
and epoch counter is a single pytree, so checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Polyak/EMA shadow weights (config ``ema: 0.999``; None = off).
    # Seeded from the init params, updated inside the fused train step,
    # evaluated/exported by the trainer in place of the raw params.
    # batch_stats are NOT shadowed — the running stats are already an
    # exponential average. The decay rides along as a pytree leaf so
    # the update stays inside jit (and shards with the state).
    ema_params: Any = None
    ema_decay: Any = None

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
            ema_params=ema,
        )

    def set_learning_rate(self, lr: float) -> "TrainState":
        """Works with optax.inject_hyperparams-wrapped optimizers, also
        when wrapped in optax.MultiSteps (gradient accumulation — the
        hyperparams live on the inner state)."""

        def fix(opt_state):
            if hasattr(opt_state, "hyperparams"):
                hp = dict(opt_state.hyperparams)
                hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
                return opt_state._replace(hyperparams=hp)
            if hasattr(opt_state, "inner_opt_state"):
                return opt_state._replace(
                    inner_opt_state=fix(opt_state.inner_opt_state))
            return opt_state

        return self.replace(opt_state=fix(self.opt_state))


def create_train_state(model, rng, sample_input, tx,
                       train_kwargs: Optional[Dict] = None,
                       ema_decay: float = 0.0):
    """Initialize model variables and optimizer state. ``ema_decay`` > 0
    adds Polyak-averaged shadow params (seeded from the init weights —
    no bias correction needed)."""
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, sample_input,
        **(train_kwargs or {}),
    )
    params = variables["params"]
    # plain dict, matching what a mutable=["batch_stats"] apply returns
    # for stat-free models — a FrozenDict() here would differ in pytree
    # TYPE from the step's {} output, which is fatal as a lax.scan carry
    # (flax>=0.7 init returns plain dicts throughout)
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        # REAL copies — aliasing the param buffers would make the
        # donated train step see the same buffer twice (donate_argnums)
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
        ema_decay=jnp.asarray(ema_decay, jnp.float32) if ema_decay else None,
    )
