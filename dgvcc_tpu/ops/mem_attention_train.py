"""Fused TWO-VIEW memory-attention training op (Pallas, custom VJP).

The DG two-view training step (models/dg.py::forward_train, reference
models.py:298-335) runs the prototype attention on BOTH views and
couples them with a consistency loss on the attention probabilities:

    l_i = y_i @ M / sqrt(K)          # (B, P, S) f32 logits
    p_i = softmax_S(l_i)
    out_i = cast_bf16(p_i) @ M.T     # f32 accum -> y dtype
    loss_con = mean((p_1 - p_2)^2)

Unfused, XLA materializes the f32 logits AND probabilities of both
views in HBM (at 320^2/B=16 training geometry: 419 MB per (B, P, S)
tensor, several round trips with the softmax/JSD backward) — measured
18.1 ms of the 116.5 ms train step (profile_train 'mem_identity'
ablation), against ~3 ms of matmul compute. This op runs the whole
two-view block tile-by-tile in VMEM (flash-attention-style: the S axis
fits entirely in VMEM, so no online softmax is needed), materializing
only the (B, P, K) inputs/outputs and recomputing the tile softmaxes
in the backward — HBM traffic drops from ~6 GB to ~0.3 GB per step.

Gradient (per view i, j the other view; g = cotangent of loss_con):
    dp_i  = dout_i @ M  +  g * 2/N * (p_i - p_j) * sign_i
    dl_i  = p_i * (dp_i - <dp_i, p_i>_S)          # softmax VJP
    dy_i  = dl_i @ M.T / sqrt(K)
    dM    = sum_i [ dout_i^T @ p_i  +  y_i^T @ dl_i / sqrt(K) ]

Parity: forward AND gradients tested against the einsum path in
interpret mode (tests/test_mem_attention_train.py); the full-recipe
lockstep A/B covers it end-to-end against the reference trainer.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_f32(y, mf, inv_sqrt_k):
    l = jax.lax.dot_general(y, mf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_sqrt_k
    mx = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(y1_ref, y2_ref, m_ref, out1_ref, out2_ref, loss_ref, *,
                inv_sqrt_k):
    m = m_ref[:]                           # (K, S) model dtype
    mf = m.astype(jnp.float32)
    p1 = _softmax_f32(y1_ref[0].astype(jnp.float32), mf, inv_sqrt_k)
    p2 = _softmax_f32(y2_ref[0].astype(jnp.float32), mf, inv_sqrt_k)
    # out = cast(p) @ M.T, f32 accumulation (einsum-path parity)
    for p, out_ref in ((p1, out1_ref), (p2, out2_ref)):
        out = jax.lax.dot_general(
            p.astype(m.dtype), m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum((p1 - p2) ** 2)


def _bwd_kernel(y1_ref, y2_ref, m_ref, do1_ref, do2_ref, g_ref,
                dy1_ref, dy2_ref, dm_ref, *, inv_sqrt_k, inv_n):
    m = m_ref[:]
    mf = m.astype(jnp.float32)
    y1 = y1_ref[0].astype(jnp.float32)
    y2 = y2_ref[0].astype(jnp.float32)
    p1 = _softmax_f32(y1, mf, inv_sqrt_k)
    p2 = _softmax_f32(y2, mf, inv_sqrt_k)
    gc = g_ref[0, 0] * (2.0 * inv_n)       # consistency chain factor
    diff = p1 - p2

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dm_ref[:] = jnp.zeros_like(dm_ref)

    for y, p, do_ref, dy_ref, sgn in ((y1, p1, do1_ref, dy1_ref, 1.0),
                                      (y2, p2, do2_ref, dy2_ref, -1.0)):
        do = do_ref[0].astype(jnp.float32)              # (T, K)
        dp = jax.lax.dot_general(do, mf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = dp + (sgn * gc) * diff
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dy = jax.lax.dot_general(dl, mf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dy_ref[0] = (dy * inv_sqrt_k).astype(dy_ref.dtype)
        # dM += do^T @ p_hat + y^T @ dl / sqrt(K)   — (K, S) accum.
        # p_hat is the model-dtype-ROUNDED probabilities: the forward
        # casts p before the back-projection matmul, so the exact VJP
        # of that graph multiplies dout by the rounded values
        p_hat = p.astype(m.dtype).astype(jnp.float32)
        dm_ref[:] += (
            jax.lax.dot_general(do, p_hat, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + inv_sqrt_k * jax.lax.dot_general(
                y, dl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))


def _pad_p(a, p_pad):
    p = a.shape[1]
    return a if p == p_pad else jnp.pad(a, ((0, 0), (0, p_pad - p), (0, 0)))


@functools.lru_cache(maxsize=None)
def _make_op(tile: int, interpret: bool):
    """custom_vjp closure per (tile, interpret) static config."""

    @jax.custom_vjp
    def op(y1, y2, mem):
        out1, out2, loss_sum = _fwd(y1, y2, mem)
        b, p, _ = y1.shape
        return out1, out2, loss_sum / (b * p * mem.shape[1])

    def _grids(y1, mem):
        b, p, k = y1.shape
        s = mem.shape[1]
        p_pad = int(math.ceil(p / tile)) * tile
        return b, p, k, s, p_pad

    def _fwd(y1, y2, mem):
        b, p, k, s, p_pad = _grids(y1, mem)
        y1p, y2p = _pad_p(y1, p_pad), _pad_p(y2, p_pad)
        out1, out2, loss = pl.pallas_call(
            functools.partial(_fwd_kernel, inv_sqrt_k=1.0 / math.sqrt(k)),
            out_shape=(
                jax.ShapeDtypeStruct((b, p_pad, k), y1.dtype),
                jax.ShapeDtypeStruct((b, p_pad, k), y2.dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            grid=(b, p_pad // tile),
            in_specs=[
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, s), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(y1p, y2p, mem)
        return out1[:, :p], out2[:, :p], loss[0, 0]

    def fwd_rule(y1, y2, mem):
        b, p, k, s, _ = _grids(y1, mem)
        out1, out2, loss_sum = _fwd(y1, y2, mem)
        n = b * p * s
        return (out1, out2, loss_sum / n), (y1, y2, mem)

    def bwd_rule(res, cts):
        y1, y2, mem = res
        do1, do2, dcon = cts
        b, p, k, s, p_pad = _grids(y1, mem)
        inv_n = 1.0 / (b * p * s)
        y1p, y2p = _pad_p(y1, p_pad), _pad_p(y2, p_pad)
        do1p = _pad_p(do1.astype(y1.dtype), p_pad)
        do2p = _pad_p(do2.astype(y2.dtype), p_pad)
        g = jnp.reshape(dcon.astype(jnp.float32), (1, 1))
        dy1, dy2, dm = pl.pallas_call(
            functools.partial(_bwd_kernel,
                              inv_sqrt_k=1.0 / math.sqrt(k), inv_n=inv_n),
            out_shape=(
                jax.ShapeDtypeStruct((b, p_pad, k), y1.dtype),
                jax.ShapeDtypeStruct((b, p_pad, k), y2.dtype),
                jax.ShapeDtypeStruct((k, s), jnp.float32),
            ),
            grid=(b, p_pad // tile),
            in_specs=[
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, s), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, s), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(y1p, y2p, mem, do1p, do2p, g)
        return dy1[:, :p], dy2[:, :p], dm.astype(mem.dtype)

    op.defvjp(fwd_rule, bwd_rule)
    return op


def memory_attention_train(y1: jnp.ndarray, y2: jnp.ndarray,
                           mem: jnp.ndarray, tile: int = 256,
                           interpret: bool = False):
    """Fused two-view training attention.

    y1, y2: (B, P, K) pixel features (both views); mem: (K, S).
    Returns (out1, out2, loss_con) matching the einsum path:
    out_i = softmax(y_i@mem/sqrt(K)).astype(y dtype) @ mem.T and
    loss_con = mean((p1 - p2)^2). Differentiable w.r.t. all three
    inputs via the recomputing Pallas backward.
    """
    return _make_op(int(tile), bool(interpret))(y1, y2, mem)


def memory_attention_train_reference(y1, y2, mem):
    """The einsum twin (used by parity tests and as the CPU path)."""
    k = y1.shape[-1]

    def view(y):
        l = jnp.einsum("bpk,ks->bps", y, mem,
                       preferred_element_type=jnp.float32) / math.sqrt(k)
        p = jax.nn.softmax(l, axis=-1)
        out = jnp.einsum("bps,sk->bpk", p.astype(mem.dtype), mem.T,
                         preferred_element_type=jnp.float32)
        return p, out.astype(y.dtype)

    p1, out1 = view(y1)
    p2, out2 = view(y2)
    return out1, out2, jnp.mean((p1 - p2) ** 2)
