"""Composed data × tensor parallelism (parallel/mesh.py
build_parallel_train_step_2d): the full 'final'-mode train step over a
2-D (data=4, model=2) mesh — batch sharded over 'data', memory bank
sharded over 'model' with a global-softmax TP decomposition — must
match the 1-D data-parallel step numerically: same loss, same updated
params (incl. the reassembled bank).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgvcc_tpu.core.registry import LOSSES, MODELS
import dgvcc_tpu.losses  # noqa: F401
import dgvcc_tpu.models  # noqa: F401
from dgvcc_tpu.parallel import make_mesh, shard_batch
from dgvcc_tpu.parallel.mesh import (
    build_parallel_train_step,
    build_parallel_train_step_2d,
    make_mesh_2d,
    replicate,
    shard_state_2d,
)
from dgvcc_tpu.train.optim import build_optimizer
from dgvcc_tpu.train.state import create_train_state


def _setup(tp_axis=None):
    model = MODELS.build("final", mem_size=32, mem_dim=16,
                         tp_axis=tp_axis, dtype=jnp.float32)
    # sgd, NOT adam: updates stay proportional to gradients, so the
    # param comparison tests the grads themselves. (adam normalizes
    # mathematically-zero grads — e.g. conv biases in front of BN — into
    # full ±lr steps whose sign is f32 reduction-order noise.)
    tx = build_optimizer({"name": "sgd", "params": {"lr": 1e-2}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    return model, state


def _batch(b=4, hw=32):
    rng = np.random.default_rng(0)
    return {
        "img1": rng.normal(size=(b, hw, hw, 3)).astype(np.float32),
        "img2": rng.normal(size=(b, hw, hw, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, (b, hw, hw, 1)).astype(np.float32),
        "bmap": (rng.uniform(size=(b, hw // 16, hw // 16, 1)) > 0.5
                 ).astype(np.float32),
    }


def test_2d_step_matches_1d_dp():
    loss = LOSSES.build("mse")
    batch = _batch()

    model_1d, state_1d = _setup()
    mesh_1d = make_mesh(4)
    step_1d = build_parallel_train_step(model_1d, loss, "final", 1000.0,
                                        mesh_1d, donate=False)
    s1, m1 = step_1d(replicate(mesh_1d, state_1d), shard_batch(mesh_1d, _batch()),
                     jax.random.PRNGKey(7), jnp.int32(0))

    from dgvcc_tpu.parallel.tp import MODEL_AXIS

    # init with the tp-free twin (collectives are unbound outside
    # shard_map); same seed → identical params to the 1-D run
    model_2d = MODELS.build("final", mem_size=32, mem_dim=16,
                            tp_axis=MODEL_AXIS, dtype=jnp.float32)
    _, state_2d = _setup()
    mesh_2d = make_mesh_2d(4, 2)
    step_2d = build_parallel_train_step_2d(model_2d, loss, "final", 1000.0,
                                           mesh_2d, donate=False)
    s2, m2 = step_2d(shard_state_2d(mesh_2d, state_2d), dict(batch),
                     jax.random.PRNGKey(7), jnp.int32(0))

    # same loss (softmax reduction order differs → f32 noise only)
    np.testing.assert_allclose(float(m2["loss_total"]),
                               float(m1["loss_total"]), rtol=1e-5)

    # same updated params — incl. the bank reassembled from its shards
    p1 = jax.tree.map(np.asarray, s1.params)
    p2 = jax.tree.map(np.asarray, s2.params)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            flat2[path], leaf, rtol=1e-3, atol=5e-7,
            err_msg=jax.tree_util.keystr(path))

    # the 2-D state keeps the bank sharded over 'model'
    mem_sh = s2.params["memory"]["mem"].sharding
    assert MODEL_AXIS in (mem_sh.spec[1],), mem_sh


def test_2d_eval_forward_matches_single():
    """tp_axis eval forward (global-softmax bank) equals the plain model."""
    from dgvcc_tpu.parallel.tp import MODEL_AXIS
    from jax.sharding import PartitionSpec as P

    model_ref, state = _setup()
    model_tp = MODELS.build("final", mem_size=32, mem_dim=16,
                            tp_axis=MODEL_AXIS, dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    d_ref, c_ref = model_ref.apply(variables, x)

    mesh = make_mesh_2d(1, 8)

    def fwd(v, t):
        return model_tp.apply(v, t)

    from dgvcc_tpu.parallel.mesh import _state_specs
    specs = _state_specs(variables, MODEL_AXIS)
    out = jax.jit(jax.shard_map(fwd, mesh=mesh, in_specs=(specs, P()),
                                out_specs=(P(), P())))(variables, x)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-5)
