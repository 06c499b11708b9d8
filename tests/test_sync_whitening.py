"""Live sync-whitening under data parallelism.

The reference's one distributed feature is all_reduce of whitening
batch mean/cov in the forward pass (models/ISW/sync_switchwhiten.py:12-56)
plus SyncBatchNorm (models/ISW/config.py:135). Here that is
``axis_name``-pmean inside SwitchWhiten / flax BatchNorm, executed under
shard_map over the data mesh axis. These tests prove the sharded
computation equals the single-device computation on the concatenated
batch (the defining property of synchronized statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dgvcc_tpu.core.registry import MODELS, LOSSES
import dgvcc_tpu.models  # noqa: F401
import dgvcc_tpu.losses  # noqa: F401
from dgvcc_tpu.nn.whitening import SwitchWhiten
from dgvcc_tpu.parallel import make_mesh, shard_batch, build_parallel_train_step
from dgvcc_tpu.parallel.mesh import DATA_AXIS, replicate
from dgvcc_tpu.train.optim import build_optimizer
from dgvcc_tpu.train.state import create_train_state
from dgvcc_tpu.train.steps import build_train_step, jit_train_step

H = W = 32
B = 8


def test_switchwhiten_sync_matches_full_batch():
    """SwitchWhiten(axis_name) under shard_map == plain SwitchWhiten on
    the full batch: output AND updated running mean/cov."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, 4, 4, 8)).astype(np.float32)

    plain = SwitchWhiten(8, num_pergroup=4)
    sync = SwitchWhiten(8, num_pergroup=4, axis_name=DATA_AXIS)
    variables = plain.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    out_full, mut_full = plain.apply(variables, jnp.asarray(x), train=True,
                                     mutable=["batch_stats"])

    mesh = make_mesh(8)

    def shard_fn(v, xs):
        out, mut = sync.apply(v, xs, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    sm = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(DATA_AXIS)),
                   out_specs=(P(DATA_AXIS), P()))
    out_sh, bs_sh = jax.jit(sm)(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_full),
                               rtol=2e-4, atol=2e-5)
    for key in ("running_mean", "running_cov"):
        np.testing.assert_allclose(
            np.asarray(bs_sh[key]),
            np.asarray(mut_full["batch_stats"][key]),
            rtol=1e-5, atol=1e-6, err_msg=key)


def _dp_vs_single(model_name, mode, extra_batch=None, **model_params):
    """Run one train step single-device on the full batch and data-
    parallel over 8 shards; the models have no dropout, so with synced
    whitening/BN stats the two must match."""
    mesh = make_mesh(8)
    tx = build_optimizer({"name": "sgd", "params": {"lr": 0.05}})
    model_s = MODELS.build(model_name, **model_params)
    model_p = MODELS.build(model_name, axis_name=DATA_AXIS, **model_params)
    state = create_train_state(model_s, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), tx)
    loss = LOSSES.build("mse")

    rng = np.random.default_rng(3)
    data = {
        "img1": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, size=(B, H, W, 1)).astype(np.float32),
    }

    single = jit_train_step(
        build_train_step(model_s, loss, mode, 1000.0), donate=False)
    batch_s = {k: jnp.asarray(v) for k, v in data.items()}
    if extra_batch:
        batch_s.update(extra_batch)
    state_s, m_s = single(state, batch_s, jax.random.PRNGKey(7), jnp.int32(0))

    par = build_parallel_train_step(model_p, loss, mode, 1000.0, mesh,
                                    donate=False)
    batch_p = shard_batch(mesh, data)
    if extra_batch:
        batch_p.update(extra_batch)
    state_p, m_p = par(replicate(mesh, state), batch_p,
                       jax.random.PRNGKey(7), jnp.int32(0))

    assert float(m_p["loss_total"]) == pytest.approx(
        float(m_s["loss_total"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(state_s.params),
                    jax.tree.leaves(jax.device_get(state_p.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
    for a, b in zip(jax.tree.leaves(state_s.batch_stats),
                    jax.tree.leaves(jax.device_get(state_p.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_sw_counter_dp_matches_single_device():
    """SW counter (SwitchWhiten stem + blocks + BN): sharded train step
    == full-batch step, proving live whitening-stat sync."""
    _dp_vs_single("sw", "simple", layers=(1, 1, 1))


def test_isw_dp_matches_single_device():
    """Mode 'isw' under the data mesh (was: raised ValueError). The
    replicated mask constants ride the isw_ batch keys."""
    from dgvcc_tpu.models.whitening import IswCovTracker

    tracker = IswCovTracker()
    masks, nums, _m = tracker.mask_batch()
    _dp_vs_single("isw", "isw",
                  extra_batch={"isw_masks": masks, "isw_nums": nums},
                  layers=(1, 1, 1))


def test_isw_dp_with_real_masks_runs():
    """Sensitive-covariance masks (nonzero) flow through the parallel
    step at epoch > 5 where the whitening loss is active."""
    from dgvcc_tpu.models.whitening import ISW_WT_CHANNELS, IswCovTracker

    tracker = IswCovTracker()
    rng = np.random.default_rng(5)
    tracker.add({f"m{i}": rng.uniform(size=(c, c))
                 for i, c in enumerate(ISW_WT_CHANNELS)})
    tracker.set_mask_matrix()
    masks, nums, _m = tracker.mask_batch()

    mesh = make_mesh(8)
    tx = build_optimizer({"name": "sgd", "params": {"lr": 0.05}})
    model = MODELS.build("isw", axis_name=DATA_AXIS, layers=(1, 1, 1))
    model_init = MODELS.build("isw", layers=(1, 1, 1))
    state = create_train_state(model_init, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3)), tx)
    loss = LOSSES.build("mse")
    par = build_parallel_train_step(model, loss, "isw", 1000.0, mesh,
                                    donate=False)
    data = {
        "img1": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, size=(B, H, W, 1)).astype(np.float32),
    }
    batch = shard_batch(mesh, data)
    batch.update({"isw_masks": masks, "isw_nums": nums})
    state_p, metrics = par(replicate(mesh, state),
                           batch, jax.random.PRNGKey(1), jnp.int32(6))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["loss_wt"]) > 0.0  # whitening loss engaged
    leaf = jax.tree.leaves(state_p.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_joint_dp_runs_and_stays_replicated():
    """Two-optimizer joint mode under the data mesh: runs, finite, both
    states replicated (gen + reg grads each DDP-synced)."""
    from dgvcc_tpu.parallel.mesh import build_parallel_joint_step

    mesh = make_mesh(8)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
    gen = MODELS.build("gen")
    reg = MODELS.build("reg_mem")
    sample = jnp.zeros((1, H, W, 3))
    gen_state = create_train_state(gen, jax.random.PRNGKey(7), sample, tx)
    reg_state = create_train_state(reg, jax.random.PRNGKey(0), sample, tx)
    loss = LOSSES.build("mse")

    step = build_parallel_joint_step(gen, reg, loss, 1000.0, mesh,
                                     donate=False)
    rng = np.random.default_rng(2)
    batch = shard_batch(mesh, {
        "img1": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "img2": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, size=(B, H, W, 1)).astype(np.float32),
        "bmap": (rng.uniform(size=(B, H // 16, W // 16, 1)) > 0.5
                 ).astype(np.float32),
    })
    gen_state, reg_state, metrics = step(
        replicate(mesh, gen_state), replicate(mesh, reg_state), batch,
        jax.random.PRNGKey(1), jnp.int32(0))
    assert np.isfinite(float(metrics["loss_total"]))
    for st in (gen_state, reg_state):
        leaf = jax.tree.leaves(st.params)[0]
        assert leaf.sharding.is_fully_replicated
