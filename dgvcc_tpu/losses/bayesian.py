"""Bayesian Loss (Ma et al. 2019) — TPU-native vectorization.

The reference (/root/reference/losses/bl.py) keeps points as ragged
Python lists and loops per image. Here everything is padded to a static
``max_points`` and batched:

  * posterior: for each annotation n and each stride-cell p of the crop,
    prob[n, p] = softmax_n( -||cell_p - point_n||^2 / (2 sigma^2) ) —
    one (N, C) + (N, C) squared-distance expansion and a masked softmax
    over the *point* axis (invalid/padded points get -inf logits);
  * optional background row: bg_dis = (st_size*bg_ratio - sqrt(min_n
    dis))^2 appended as row N (bl.py:38-42);
  * per-point expected count = prob @ density_flat — an MXU matmul;
  * loss: L1 |target - expected| with the reference's 90 %-smallest
    trimming over the first N-1 entries plus the last entry verbatim
    (bl.py:75-78), implemented with a sort + rank mask (static shapes,
    data-dependent k handled arithmetically, no dynamic slicing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dgvcc_tpu.core.registry import LOSSES


def _posterior(points, mask, st_size, cood, sigma, bg_ratio, use_bg):
    """prob over (points[, bg]) per density cell, one image.

    points: (N, 2) xy; mask: (N,); cood: (C,) cell centers.
    Returns prob (N+1, C*C) with the bg row zeroed when use_bg=False.
    """
    x = points[:, 0:1]
    y = points[:, 1:2]
    x_dis = (x - cood[None, :]) ** 2  # (N, C)
    y_dis = (y - cood[None, :]) ** 2  # (N, C)
    dis = y_dis[:, :, None] + x_dis[:, None, :]  # (N, C, C)
    n, c, _ = dis.shape
    dis = dis.reshape(n, c * c)

    neg_inf = jnp.float32(-1e30)
    logits = -dis / (2.0 * sigma**2)
    logits = jnp.where(mask[:, None], logits, neg_inf)

    if use_bg:
        big = jnp.float32(1e30)
        min_dis = jnp.min(jnp.where(mask[:, None], dis, big), axis=0, keepdims=True)
        min_dis = jnp.clip(min_dis, 0.0)
        d = st_size * bg_ratio
        bg_dis = (d - jnp.sqrt(min_dis)) ** 2
        bg_logit = -bg_dis / (2.0 * sigma**2)
        # bg row only participates when the image has any point at all
        any_pt = jnp.any(mask)
        bg_logit = jnp.where(any_pt, bg_logit, neg_inf)
        logits = jnp.concatenate([logits, bg_logit], axis=0)  # (N+1, C*C)
    else:
        logits = jnp.concatenate([logits, jnp.full((1, c * c), neg_inf)], axis=0)

    # masked softmax over the point axis; all-masked columns -> 0
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - jnp.maximum(m, neg_inf / 2))
    denom = jnp.sum(e, axis=0, keepdims=True)
    return jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)


def _trimmed_l1(res, count):
    """Reference trimming (bl.py:75-78): of entries 0..count-2 keep the
    ceil(0.9*(count-1)) smallest, always add entry count-1.

    res: (M,) padded |target - expected| with rows >= count already 0.
    count: scalar int — number of live rows (points [+ bg]).
    """
    m = res.shape[0]
    idx = jnp.arange(m)
    live_head = idx < (count - 1)  # entries subject to trimming
    num = jnp.ceil(0.9 * (count.astype(jnp.float32) - 1.0)).astype(jnp.int32)

    # rank of each live head entry among live head entries (ascending)
    big = jnp.float32(3e38)
    keyed = jnp.where(live_head, res, big)
    order = jnp.argsort(keyed)  # live smallest first, dead at the end
    ranks = jnp.zeros(m, jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    keep = live_head & (ranks < num)

    head_sum = jnp.sum(jnp.where(keep, res, 0.0))
    last = jnp.sum(jnp.where(idx == count - 1, res, 0.0))
    return head_sum + last


@dataclasses.dataclass
class BayesianLoss:
    """Registered as 'bl' (reference main.py:52-53 → losses/bl.py:82-91).

    Call with padded batches:
        loss(points (B,N,2), masks (B,N), targets (B,N), st_sizes (B,),
             pred_density (B,h,w,1))
    where h = w = c_size/stride (the density head output on a crop).
    """

    sigma: float = 8.0
    c_size: int = 320
    stride: int = 1
    background_ratio: float = 0.15
    use_background: bool = True

    kind = "bl"

    def __post_init__(self):
        assert self.c_size % self.stride == 0

    def __call__(self, points, masks, targets, st_sizes, pred_density):
        cood = (
            jnp.arange(0, self.c_size, self.stride, dtype=jnp.float32)
            + self.stride / 2.0
        )
        b = points.shape[0]
        pred = pred_density.astype(jnp.float32).reshape(b, -1)  # (B, C*C)

        def per_image(pts, msk, tgt, st, den):
            prob = _posterior(
                pts.astype(jnp.float32),
                msk.astype(bool),
                st.astype(jnp.float32),
                cood,
                self.sigma,
                self.background_ratio,
                self.use_background,
            )  # (N+1, C*C)
            expected = prob @ den  # (N+1,)
            n_pts = jnp.sum(msk.astype(jnp.int32))
            if self.use_background:
                # target rows: point targets then bg target 0 (bl.py:68-71)
                tgt_full = jnp.concatenate([tgt, jnp.zeros((1,), jnp.float32)])
                # live rows = n_pts points + 1 bg, but bg sits at index N
                # (padded). Compact: move the bg expectation into slot n_pts.
                row_idx = jnp.arange(tgt.shape[0] + 1)
                exp_bg = expected[-1]
                expected_c = jnp.where(row_idx == n_pts, exp_bg, expected)
                expected_c = jnp.where(row_idx < n_pts, expected, expected_c)
                expected_c = jnp.where(row_idx > n_pts, 0.0, expected_c)
                tgt_c = jnp.where(row_idx < n_pts, tgt_full, 0.0)
                res = jnp.abs(tgt_c - expected_c)
                count = n_pts + 1
            else:
                row_idx = jnp.arange(tgt.shape[0] + 1)
                expected_c = jnp.where(row_idx < n_pts, expected, 0.0)
                tgt_c = jnp.where(row_idx < n_pts, jnp.concatenate([tgt, jnp.zeros(1)]), 0.0)
                res = jnp.abs(tgt_c - expected_c)
                count = n_pts

            # no-point image: loss = |sum(pred)| (bl.py:63-66 → res[-1]
            # with target 0); our trimming degenerates correctly only for
            # count >= 1, so handle it explicitly.
            empty_loss = jnp.abs(jnp.sum(den))
            trimmed = _trimmed_l1(res, count)
            return jnp.where(n_pts == 0, empty_loss, trimmed)

        losses = jax.vmap(per_image)(
            points, masks, targets.astype(jnp.float32), st_sizes, pred
        )
        return jnp.mean(losses)


# 'device' appears in reference BL configs (a torch device string) — drop it.
LOSSES.register(
    "bl", lambda **kw: BayesianLoss(**{k: v for k, v in kw.items() if k != "device"})
)
