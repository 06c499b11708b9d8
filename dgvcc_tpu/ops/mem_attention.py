"""Fused prototype-memory attention (Pallas).

The DG memory bank (models/dg.py::MemoryBank, reference
models.py:116-125) re-expresses every pixel feature as a convex
combination of S=1024 learned prototypes:

    logits = y @ mem / sqrt(K)        # (P, K) x (K, S)
    y_new  = softmax_S(logits) @ mem.T  # (P, S) x (S, K)

Unfused, XLA materializes the (B, P, S) attention tensor in HBM twice
(write + read) — at serving resolution (768x1024 → P = 49k pixels)
that is ~400 MB of traffic per frame. This kernel runs both matmuls and
the softmax entirely in VMEM per pixel tile: the prototype bank
(K x S = 256 x 1024 fp32 = 1 MB) stays resident, and only y in / y_new
out touch HBM. Single-query-attention structure — no online softmax
needed since the full S axis fits in VMEM.

Inference-path only (the training loss needs the logits; the einsum
path in MemoryBank serves that). Parity tested against the einsum in
interpret mode and on hardware.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, mem_ref, out_ref, *, inv_sqrt_k):
    y = y_ref[0].astype(jnp.float32)          # (T, K)
    mem = mem_ref[:].astype(jnp.float32)      # (K, S)
    logits = jnp.dot(y, mem, preferred_element_type=jnp.float32) * inv_sqrt_k
    # row softmax over S, fully in VMEM
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(attn, mem.T, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def memory_attention_fused(y: jnp.ndarray, mem: jnp.ndarray,
                           tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """y: (B, P, K) pixel features; mem: (K, S) prototypes → (B, P, K).

    P is padded to a tile multiple internally (extra rows are dropped).
    """
    b, p, k = y.shape
    s = mem.shape[1]
    p_pad = int(math.ceil(p / tile)) * tile
    if p_pad != p:
        y = jnp.pad(y, ((0, 0), (0, p_pad - p), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, inv_sqrt_k=1.0 / math.sqrt(k)),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, k), y.dtype),
        grid=(b, p_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, mem)
    return out[:, :p]


def memory_attention_reference(y: jnp.ndarray, mem: jnp.ndarray) -> jnp.ndarray:
    """The einsum path (MemoryBank math) for parity checks."""
    k = y.shape[-1]
    logits = jnp.einsum("bpk,ks->bps", y.astype(jnp.float32),
                        mem.astype(jnp.float32)) / math.sqrt(k)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bps,sk->bpk", attn,
                      mem.T.astype(jnp.float32)).astype(y.dtype)
