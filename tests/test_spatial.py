"""Spatial training parallelism (parallel/spatial.py, mesh: {spatial: N}).

The crop height shards over the mesh; GSPMD partitions the UNCHANGED
fused train step (halo-exchange convs, global-view BN stats). The
reference has no analog (it crops to 320² precisely because one GPU
must hold the sample); the contract here is equality with the
single-device step. Runs on the conftest 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgvcc_tpu.losses  # noqa: F401
import dgvcc_tpu.models  # noqa: F401
from dgvcc_tpu.core.registry import LOSSES, MODELS
from dgvcc_tpu.parallel.mesh import replicate
from dgvcc_tpu.parallel.spatial import (build_spatial_train_step,
                                        make_spatial_mesh,
                                        shard_batch_spatial)
from dgvcc_tpu.train.state import create_train_state
from dgvcc_tpu.train.steps import build_train_step, jit_train_step


def _den_batch(b=2, h=64, w=64, ds=1, two_view=False, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "img1": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, (b, h // ds, w // ds, 1)).astype(np.float32),
    }
    if two_view:
        batch["img2"] = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
        batch["bmap"] = (rng.uniform(0, 1, (b, h // 16, w // 16, 1)) > 0.5
                         ).astype(np.float32)
    return batch


def _states(model, tx_lr=1e-3):
    import optax

    tx = optax.sgd(tx_lr)
    mk = lambda: create_train_state(model, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)), tx)
    return mk(), mk()


def test_spatial_step_matches_single_device_mcnn():
    """Single-view conv net: per-step losses track the unsharded step
    tightly over several optimizer steps."""
    model = MODELS.build("mcnn", dtype=jnp.float32)
    loss = LOSSES.build("mse")
    s1, s8 = _states(model)
    mesh = make_spatial_mesh(8)
    s8 = replicate(mesh, s8)
    step1 = jit_train_step(build_train_step(model, loss, "simple", 1000.0),
                           donate=False)
    step8 = build_spatial_train_step(model, loss, "simple", 1000.0, mesh,
                                     donate=False)
    batch = _den_batch(ds=4)
    for i in range(5):
        k = jax.random.PRNGKey(10 + i)
        s1, m1 = step1(s1, {kk: jnp.asarray(v) for kk, v in batch.items()},
                       k, jnp.int32(0))
        s8, m8 = step8(s8, batch, k, jnp.int32(0))
        np.testing.assert_allclose(float(m8["loss_total"]),
                                   float(m1["loss_total"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_spatial_step_dg_final_first_step_exact():
    """The full two-view DG-final step (dropout, error masks, memory
    attention, cls fusion): the FIRST step — same weights both sides —
    matches to float reduction order, proving the partitioned program
    (incl. partitionable-threefry dropout bits) computes the
    single-device math. Later steps separate at the reduction-order-
    chaos rate (binarized error masks flip on 1e-7 noise), so only
    loose tracking is asserted beyond step 0."""
    model = MODELS.build("final", dtype=jnp.float32, pretrained=False,
                         mem_size=16, mem_dim=8)
    loss = LOSSES.build("mse")
    s1, s8 = _states(model)
    mesh = make_spatial_mesh(8)
    s8 = replicate(mesh, s8)
    step1 = jit_train_step(build_train_step(model, loss, "final", 1000.0),
                           donate=False)
    step8 = build_spatial_train_step(model, loss, "final", 1000.0, mesh,
                                     donate=False)
    batch = _den_batch(two_view=True)
    for i in range(3):
        k = jax.random.PRNGKey(100 + i)
        s1, m1 = step1(s1, {kk: jnp.asarray(v) for kk, v in batch.items()},
                       k, jnp.int32(0))
        s8, m8 = step8(s8, batch, k, jnp.int32(0))
        rtol = 1e-5 if i == 0 else 5e-2
        np.testing.assert_allclose(float(m8["loss_total"]),
                                   float(m1["loss_total"]), rtol=rtol)


def test_spatial_batch_placement():
    """Full-res keys shard on H; indivisible low-res targets and
    non-spatial keys replicate; an indivisible IMAGE raises (silent
    replication would defeat the sharding — review finding)."""
    mesh = make_spatial_mesh(8)
    batch = {
        "img1": np.zeros((2, 64, 48, 3), np.float32),
        "bmap": np.zeros((2, 4, 4, 1), np.float32),      # 4 % 8 != 0
        "isw_masks": np.zeros((3, 16, 16), np.float32),  # replicated key
    }
    placed = shard_batch_spatial(mesh, batch)
    assert placed["img1"].sharding.spec == jax.sharding.PartitionSpec(
        None, "spatial")
    for k in ("bmap", "isw_masks"):
        assert placed[k].sharding.spec == jax.sharding.PartitionSpec()

    with pytest.raises(ValueError, match="divisible"):
        shard_batch_spatial(mesh, {"img1": np.zeros((2, 60, 48, 3),
                                                    np.float32)})


def test_mesh_oversubscription_raises():
    """Asking for more mesh devices than exist must fail loudly, not
    silently shard less than the config promises (review finding)."""
    from dgvcc_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh(64)
    with pytest.raises(ValueError, match="devices"):
        make_spatial_mesh(64)


def test_trainer_spatial_mesh_e2e(tmp_path, synth_root_sp):
    """mesh: {spatial: 8} through the full trainer: train_test runs,
    loss is finite, checkpoints land."""
    import os

    import yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    ds = {"name": "den", "params": {"root": synth_root_sp, "crop_size": 64,
                                    "downsample": 4, "is_grey": False,
                                    "unit_size": 16, "pre_resize": 1}}
    cfg = {
        "seed": 5, "version": "sptest", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None, "mesh": {"spatial": 8},
        "model": {"name": "mcnn", "params": {}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 2, "num_workers": 0, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "scheduler": {"name": "step", "params": {"step_size": 1, "gamma": 0.9}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    trainer = DGTrainer(load_config(str(p)))
    best, _ = trainer.train_and_test()
    assert np.isfinite(best)
    assert os.path.exists(os.path.join(str(tmp_path / "logs"), "sptest",
                                       "last.ckpt"))


def test_spatial_rejects_composition_and_joint(tmp_path, synth_root_sp):
    import yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    ds = {"name": "den", "params": {"root": synth_root_sp, "crop_size": 64,
                                    "downsample": 4, "is_grey": False,
                                    "unit_size": 16, "pre_resize": 1}}
    cfg = {
        "seed": 5, "version": "spbad", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None, "mesh": {"spatial": 4, "data": 2},
        "model": {"name": "mcnn", "params": {}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 2, "num_workers": 0, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "scheduler": {"name": "step", "params": {"step_size": 1, "gamma": 0.9}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="spatial"):
        DGTrainer(load_config(str(p))).build()


@pytest.fixture(scope="module")
def synth_root_sp(synth_root_factory):
    return synth_root_factory("spds", seed=9)
