"""Auxiliary losses: orthogonality, self-similarity, instance-whitening,
triplet, JSD consistency.

Parity with /root/reference/losses/{ortho,sim,lw,triplet}.py and the
in-model JSD (models.py:148-158). These feed the generator/regressor
joint training modes and are exercised by unit tests against closed-form
values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ortho_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mean^2 of strictly-upper-triangular Gram(x, y^T) (ortho.py:5-12).

    x, y: (C, P). Note the reference takes the mean over ALL C*C entries
    (zeros included) — preserved.
    """
    gram = x @ y.T
    upper = jnp.triu(gram, k=1)
    return jnp.mean(upper**2)


def sim_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pixel self-similarity cross-entropy (sim.py:5-13).

    x, y: (N, C, H, W)-style (N, C, P) after reshape; logits[b, p, q] =
    <y[:, p], x[:, q]>; target = identity permutation.
    """
    n = x.shape[0]
    x_ = x.reshape(n, x.shape[1], -1)
    y_ = y.reshape(n, y.shape[1], -1)
    logits = jnp.einsum("bcp,bcq->bpq", y_, x_)  # (N, P, P)
    p = logits.shape[-1]
    labels = jnp.broadcast_to(jnp.arange(p), (n, p))
    # torch cross_entropy(input (N, classes, d1), target (N, d1)) treats
    # axis 1 as classes: logits[b, :, q] scores for position q.
    ce = optax.softmax_cross_entropy_with_integer_labels(
        jnp.swapaxes(logits, 1, 2), labels
    )
    return jnp.mean(ce)


def lw_loss(x: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Instance-whitening loss (lw.py:5-19): standardize per (n, c) over
    pixels, then sum of squared strictly-upper Gram entries.

    x: (N, C, H, W) or (N, C, P); mask: broadcastable (N, 1, P).
    """
    n, c = x.shape[0], x.shape[1]
    x = x.reshape(n, c, -1)
    x = x - x.mean(axis=2, keepdims=True)
    # torch.var defaults to the unbiased estimator (ddof=1)
    x = x / jnp.sqrt(x.var(axis=2, keepdims=True, ddof=1) + 1e-5)
    if mask is not None:
        x = x * mask.reshape(n, 1, -1)
    gram = jnp.einsum("bcp,bdp->bcd", x, x)
    upper = jnp.triu(gram, k=1)
    return jnp.sum(upper**2)


def triplet_loss(anchor, positive, negative, margin: float = 0.5) -> jnp.ndarray:
    """Margin triplet on squared distances (triplet.py:3-19)."""
    d_p = jnp.sum((anchor - positive) ** 2, axis=1)
    d_n = jnp.sum((anchor - negative) ** 2, axis=1)
    return jnp.mean(jnp.clip(margin + d_p - d_n, 0.0))


def jsd_loss(logits1, logits2) -> jnp.ndarray:
    """JSD-as-MSE on prototype softmaxes; see models/dg.py:jsd_as_mse."""
    p1 = jax.nn.softmax(logits1.astype(jnp.float32), axis=-1)
    p2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)
    return jnp.mean((p1 - p2) ** 2)


# NOTE: the true KL-based JSD used by DensityRegressorM lives in
# models/regressors.py (true_jsd) — the single canonical implementation,
# tested against a torch golden.
