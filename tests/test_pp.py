"""Pipeline parallelism (parallel/pp.py) — exactness vs the sequential
block stack on the 8-device virtual CPU mesh.

The pipelined stack must be numerically identical to running the same
blocks back-to-back on one device: the schedule only reorders WHEN each
(stage, microbatch) pair runs, never WHAT runs. Blocks are the real
Bottleneck used by the SW/IBN/ISW counters (nn/resnet.py), whose
ResNet-101/152 stage 3 (23/36 homogeneous blocks) is the pipeline
target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvcc_tpu.nn.resnet import Bottleneck, ResNetTrunk
from dgvcc_tpu.parallel.pp import (
    build_pipeline,
    extract_stage_blocks,
    make_pipe_mesh,
    pipelined_apply,
    split_microbatches,
    stack_block_variables,
)


def _bottleneck_blocks(n, planes=16, hw=8, seed=0):
    """n structurally-identical eval-mode bottlenecks + their block_fn."""
    block = Bottleneck(planes=planes, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    c = planes * 4
    x0 = jnp.zeros((1, hw, hw, c), jnp.float32)
    blocks = []
    for i in range(n):
        v = block.init({"params": jax.random.PRNGKey(i)}, x0)
        v = jax.tree.map(np.asarray, dict(v))
        # running stats init to 0/1 → perturb so BN actually transforms
        v["batch_stats"] = jax.tree.map(
            lambda a: np.asarray(rng.uniform(0.1, 0.9, a.shape), np.float32),
            v["batch_stats"])
        blocks.append(jax.tree.map(jnp.asarray, v))

    def block_fn(v, h):
        return block.apply(v, h, train=False)[0]

    return blocks, block_fn, c


def _sequential(blocks, block_fn, x):
    for v in blocks:
        x = block_fn(v, x)
    return x


@pytest.mark.parametrize("n_stages,n_blocks,n_micro",
                         [(4, 8, 4), (8, 8, 8), (2, 8, 1)],
                         ids=["4stage-2deep", "8stage-1deep", "2stage-1mb"])
def test_pipeline_matches_sequential(n_stages, n_blocks, n_micro):
    blocks, block_fn, c = _bottleneck_blocks(n_blocks)
    mesh = make_pipe_mesh(n_stages)
    rng = np.random.default_rng(42)
    batch = jnp.asarray(rng.normal(size=(n_micro * 2, 8, 8, c))
                        .astype(np.float32))
    mbs = split_microbatches(batch, n_micro)

    out = pipelined_apply(mesh, block_fn, stack_block_variables(blocks), mbs)
    ref = _sequential(blocks, block_fn, batch)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


def test_pipeline_from_real_trunk_stage():
    """extract_stage_blocks pulls layer3_1..layer3_4 out of a trunk's
    variables and the pipelined stack matches applying them in order."""
    trunk = ResNetTrunk(layers=(1, 1, 5, 1), block="bottleneck",
                        dtype=jnp.float32)
    variables = trunk.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    blocks = extract_stage_blocks(dict(variables), stage=3, start=1, stop=5)

    block = Bottleneck(planes=256, dtype=jnp.float32)

    def block_fn(v, h):
        return block.apply(v, h, train=False)[0]

    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(4, 4, 4, 1024)).astype(np.float32))
    mesh = make_pipe_mesh(4)
    out = pipelined_apply(mesh, block_fn, stack_block_variables(blocks),
                          split_microbatches(feats, 4))
    ref = _sequential(blocks, block_fn, feats)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


def test_built_pipeline_reuses_one_program():
    """build_pipeline returns a reusable callable — two different
    batches through the same program both match sequential."""
    blocks, block_fn, c = _bottleneck_blocks(4)
    run = build_pipeline(make_pipe_mesh(4), block_fn)
    stacked = stack_block_variables(blocks)
    rng = np.random.default_rng(9)
    for seed in (0, 1):
        batch = jnp.asarray(rng.normal(size=(4, 8, 8, c))
                            .astype(np.float32))
        out = run(stacked, split_microbatches(batch, 4))
        ref = _sequential(blocks, block_fn, batch)
        np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_shape_validation():
    blocks, block_fn, c = _bottleneck_blocks(6)
    mesh = make_pipe_mesh(4)
    mbs = jnp.zeros((2, 1, 8, 8, c), jnp.float32)
    with pytest.raises(ValueError, match="6 blocks"):
        pipelined_apply(mesh, block_fn, stack_block_variables(blocks), mbs)
    with pytest.raises(ValueError, match="not divisible"):
        split_microbatches(jnp.zeros((5, 3)), 2)


def test_extract_rejects_duplicate_trunks():
    trunk = ResNetTrunk(layers=(1, 1, 3, 1), block="bottleneck",
                        dtype=jnp.float32)
    v = dict(trunk.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3), jnp.float32)))
    two = {"params": {"a": v["params"], "b": v["params"]}}
    with pytest.raises(ValueError, match="appears 2 times"):
        extract_stage_blocks(two, stage=3, start=1, stop=2)
