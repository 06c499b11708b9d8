"""Tensor parallelism for the prototype memory bank.

The DG memory attention (models/dg.py::MemoryBank) contracts every
pixel against S=1024 prototypes. For large banks / many chips the bank
shards over the mesh: each device holds S/n prototypes, computes local
logits, and the softmax normalizes GLOBALLY via two collectives
(max + sum over the prototype axis) before the local back-projection is
psum-reduced:

    logits_k = y @ mem_k / sqrt(K)            # local  (P, S/n)
    m  = pmax_k max_S(logits_k)               # global softmax max
    z  = psum_k sum_S exp(logits_k - m)       # global partition function
    y' = psum_k (exp(logits_k - m)/z) @ mem_k.T

This is the standard TP softmax decomposition (same shape as a
vocab-parallel softmax); all collectives ride the ICI. Exactness vs the
single-device einsum is tested on the virtual CPU mesh.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def memory_attention_tp(mesh, axis_name: str = MODEL_AXIS) -> Callable:
    """Returns fn(y (B,P,K) replicated, mem (K,S) sharded on S) → (B,P,K)."""

    def shard_fn(y, mem_local):
        k = y.shape[-1]
        yf = y.astype(jnp.float32)
        ml = mem_local.astype(jnp.float32)
        logits = jnp.einsum("bpk,ks->bps", yf, ml) / math.sqrt(k)
        local_max = jnp.max(logits, axis=-1)
        gmax = jax.lax.pmax(local_max, axis_name)[..., None]
        e = jnp.exp(logits - gmax)
        z = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis_name)
        attn = e / z
        out = jnp.einsum("bps,sk->bpk", attn, ml.T)
        return jax.lax.psum(out, axis_name)

    sm = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=P(),
    )
    return jax.jit(sm)


def shard_memory(mesh, mem, axis_name: str = MODEL_AXIS):
    """Place a (K, S) bank sharded over its prototype axis."""
    return jax.device_put(mem, NamedSharding(mesh, P(None, axis_name)))
