"""Pipeline parallelism for deep homogeneous block stacks.

The depth of the whitening backbones is concentrated in one stage:
ResNet-101 layer3 has 23 bottleneck blocks, ResNet-152 has 36
(nn/resnet.py::RESNET_LAYERS, mirroring the reference's
models/SW/backbones/resnet.py / models/ibnnet/resnet_ibn.py /
models/ISW/Resnet.py torchvision geometry). All blocks after the first
(stride/downsample) block of a stage share parameter structure and
activation shape, so the stack pipelines cleanly across chips:

  * each device in a 1-D ``pipe`` mesh axis holds L/S consecutive
    blocks (weights sharded on the stacked-layer axis — model memory
    scales 1/S per chip);
  * microbatches stream through the ring: every tick each stage runs
    its local blocks (lax.scan over the stacked params) and hands its
    activation to the next stage with a single ``ppermute`` hop —
    nearest-neighbour traffic that rides the ICI ring;
  * the schedule is GPipe-style: M microbatches drain in M + S - 1
    ticks (bubble fraction (S-1)/(M+S-1)).

This is the standard JAX/TPU pipeline recipe (stacked homogeneous
layers + shard_map + ppermute), NOT a translation of anything in the
reference — the reference is single-GPU and has no pipeline concept.
Like the TP memory bank (parallel/tp.py) it is a library primitive, not
a trainer config knob. Exactness vs the sequential stack is tested on
the virtual CPU mesh (tests/test_pp.py) and exercised by
__graft_entry__.dryrun_multichip.

Memory note: the microbatch stream is replicated to every stage
(in_specs P()) — stage 0 is the only consumer, but a replicated input
keeps the schedule a pure ring. The weights (the term that actually
scales with depth) shard 1/S; outputs leave the computation as ONE
[M, ...] replicated array (masked psum of the final stage's stream).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_devices: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_devices]), (PIPE_AXIS,))


def stack_block_variables(block_vars: Sequence[Dict[str, Any]]):
    """Stack per-block flax variable dicts (identical structure) into
    one pytree with a leading layer axis — the scan/shard axis."""
    first = jax.tree.structure(block_vars[0])
    for i, bv in enumerate(block_vars[1:], 1):
        if jax.tree.structure(bv) != first:
            raise ValueError(
                f"block {i} variable structure differs from block 0 — "
                "pipeline stages must be structurally identical (skip "
                "downsample/post-norm special blocks)")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_vars)


def extract_stage_blocks(variables: Dict[str, Any], stage: int,
                         start: int, stop: int) -> List[Dict[str, Any]]:
    """Pull the per-block variables ``layer{stage}_{i}`` for
    i in [start, stop) out of a ResNetTrunk variables dict (nested under
    the counter's trunk module if present). Blocks must be structurally
    identical — i.e. skip the stage's first (downsample) block and any
    block with a unique norm site (post-IW last block, odd-index SW).
    Raises if a block name is missing, appears in more than one subtree
    (e.g. two trunks in one variables dict), or is structurally ragged
    across collections."""

    def find_all(tree, name, hits):
        if name in tree:
            hits.append(tree[name])
        for v in tree.values():
            if isinstance(v, dict):
                find_all(v, name, hits)
        return hits

    blocks = []
    cols0 = None
    for i in range(start, stop):
        per_col = {}
        for col, tree in variables.items():
            hits = find_all(tree, f"layer{stage}_{i}", [])
            if len(hits) > 1:
                raise ValueError(
                    f"layer{stage}_{i} appears {len(hits)} times in "
                    f"collection '{col}' — pass the trunk's own "
                    "variables, not a multi-model dict")
            if hits:
                per_col[col] = hits[0]
        if not per_col:
            raise KeyError(f"layer{stage}_{i} not found in variables")
        if cols0 is None:
            cols0 = set(per_col)
        elif set(per_col) != cols0:
            raise ValueError(
                f"layer{stage}_{i} has collections {sorted(per_col)} but "
                f"block {start} has {sorted(cols0)} — ragged stack")
        blocks.append(per_col)
    return blocks


def build_pipeline(mesh: Mesh, block_fn: Callable,
                   axis_name: str = PIPE_AXIS) -> Callable:
    """Build fn(stacked_vars, microbatches) -> [M, mb, ...]: run the
    microbatches through all L stacked blocks, L/S consecutive blocks
    per pipeline stage.

    block_fn(vars_one_block, x) -> y with y.shape == x.shape (residual
    blocks). ``stacked_vars`` leaves are [L, ...] with L divisible by
    the pipe size (shard_map shards them over the pipe axis);
    ``microbatches`` is [M, mb, H, W, C]. The returned callable holds
    ONE jit'd program — reuse it across batches (same shapes hit the
    jit cache).
    """
    S = mesh.shape[axis_name]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage(vars_local, mbs):
        s = jax.lax.axis_index(axis_name)
        M = mbs.shape[0]

        def tick(buf, t):
            # stage 0 ingests microbatch t (clamped once the stream is
            # drained — those outputs never reach the last stage inside
            # the tick range); later stages consume the ppermute'd buf
            x = jnp.where(s == 0,
                          jax.lax.dynamic_index_in_dim(
                              mbs, jnp.clip(t, 0, M - 1), keepdims=False),
                          buf)
            y = jax.lax.scan(lambda h, v: (block_fn(v, h), None),
                             x, vars_local)[0]
            return jax.lax.ppermute(y, axis_name, perm), y

        # the carry must be marked device-varying over the pipe axis up
        # front (ppermute's output is varying; scan carries can't change
        # vary-ness mid-loop)
        buf0 = jax.lax.pcast(jnp.zeros_like(mbs[0]), axis_name,
                             to="varying")
        _, outs = jax.lax.scan(tick, buf0, jnp.arange(M + S - 1))
        # finished microbatches are the LAST stage's ticks S-1..M+S-2;
        # mask+psum so a single replicated [M, ...] leaves the program
        # instead of every stage's full tick stream
        res = jnp.where(s == S - 1, outs[S - 1:], jnp.zeros(()))
        return jax.lax.psum(res, axis_name)

    jitted = jax.jit(shard_map(stage, mesh=mesh,
                               in_specs=(P(axis_name), P()),
                               out_specs=P()))

    def apply(stacked_vars, microbatches):
        L = jax.tree.leaves(stacked_vars)[0].shape[0]
        if L % S:
            raise ValueError(f"{L} blocks do not split over {S} stages")
        return jitted(stacked_vars, microbatches)

    return apply


def pipelined_apply(mesh: Mesh, block_fn: Callable, stacked_vars,
                    microbatches, axis_name: str = PIPE_AXIS):
    """One-shot convenience over :func:`build_pipeline` (builds a fresh
    program — loops should build once and reuse)."""
    return build_pipeline(mesh, block_fn, axis_name)(stacked_vars,
                                                     microbatches)


def split_microbatches(x, n_micro: int):
    """[B, ...] -> [n_micro, B/n_micro, ...] for the pipeline stream."""
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by {n_micro}")
    return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])
