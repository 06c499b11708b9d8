"""Gradient accumulation (`accum_steps` config extra → optax.MultiSteps).

Contract: k consecutive micro-batch steps produce exactly one optimizer
update from the MEAN of the k gradients — the params are untouched until
the k-th step, the LR knob reaches through the wrapper, and the
accumulator state survives the checkpoint round-trip. The reference has
no accumulation (single-GPU full batches); this is a TPU-memory feature
for large-crop training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from dgvcc_tpu.train.optim import build_optimizer
from dgvcc_tpu.train.state import TrainState


def _state(tx, w=0.5):
    params = {"w": jnp.full((3,), w, jnp.float32)}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params), tx=tx)


def test_two_microbatches_equal_one_mean_step():
    spec = {"name": "adamw", "params": {"lr": 1e-2}}
    plain = _state(build_optimizer(spec))
    accum = _state(optax.MultiSteps(build_optimizer(spec),
                                    every_k_schedule=2))

    g1 = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    g2 = {"w": jnp.asarray([0.0, 4.0, 0.5])}

    mid = accum.apply_gradients(g1)
    # params frozen until the accumulation window closes
    np.testing.assert_array_equal(np.asarray(mid.params["w"]),
                                  np.asarray(accum.params["w"]))
    done = mid.apply_gradients(g2)

    ref = plain.apply_gradients(jax.tree.map(lambda a, b: (a + b) / 2,
                                             g1, g2))
    np.testing.assert_allclose(np.asarray(done.params["w"]),
                               np.asarray(ref.params["w"]),
                               rtol=1e-6, atol=1e-7)


def test_set_learning_rate_reaches_through_multisteps():
    tx = optax.MultiSteps(build_optimizer(
        {"name": "sgd", "params": {"lr": 1e-2}}), every_k_schedule=2)
    st = _state(tx).set_learning_rate(0.125)
    inner = st.opt_state.inner_opt_state
    assert float(inner.hyperparams["learning_rate"]) == 0.125

    # and the injected LR is what the (accumulated) update actually uses:
    g = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    done = st.apply_gradients(g).apply_gradients(g)
    np.testing.assert_allclose(np.asarray(done.params["w"]),
                               np.asarray(st.params["w"]) - 0.125,
                               rtol=1e-6)


def test_accum_state_checkpoint_roundtrip(tmp_path):
    from dgvcc_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tx = optax.MultiSteps(build_optimizer(
        {"name": "adam", "params": {"lr": 1e-3}}), every_k_schedule=3)
    st = _state(tx).apply_gradients({"w": jnp.ones(3)})  # mid-window
    path = str(tmp_path / "accum.ckpt")
    save_checkpoint(path, st)
    restored, _, _ = load_checkpoint(path, _state(tx))
    assert int(restored.opt_state.mini_step) == 1
    np.testing.assert_array_equal(
        np.asarray(restored.opt_state.acc_grads["w"]),
        np.asarray(st.opt_state.acc_grads["w"]))


def test_accum_under_data_parallel_mesh():
    """MultiSteps inside the shard_map DP step: params stay frozen (and
    replicated) through the first micro-step, update on the second."""
    import jax.numpy as jnp

    from dgvcc_tpu.core.registry import LOSSES, MODELS
    import dgvcc_tpu.losses  # noqa: F401
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.parallel import make_mesh, shard_batch
    from dgvcc_tpu.parallel.mesh import build_parallel_train_step, replicate
    from dgvcc_tpu.train.optim import build_optimizer
    from dgvcc_tpu.train.state import create_train_state

    mesh = make_mesh(8)
    model = MODELS.build("mcnn", dtype=jnp.float32)
    tx = optax.MultiSteps(build_optimizer(
        {"name": "adam", "params": {"lr": 1e-3}}), every_k_schedule=2)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = build_parallel_train_step(model, loss, "simple", 1000.0, mesh,
                                     donate=False)

    rng = np.random.default_rng(5)
    batch = shard_batch(mesh, {
        "img1": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, (8, 8, 8, 1)).astype(np.float32),
    })
    p0 = jax.tree.leaves(state.params)[0].copy()
    state = replicate(mesh, state)
    state, _ = step(state, dict(batch), jax.random.PRNGKey(1), jnp.int32(0))
    mid = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(mid, np.asarray(p0))
    state, _ = step(state, dict(batch), jax.random.PRNGKey(2), jnp.int32(0))
    done = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.array_equal(done, np.asarray(p0))


def test_trainer_wires_accum_steps(tmp_path):
    """`accum_steps: 2` in a config → the trainer's optimizer state is a
    MultiSteps accumulator (mini_step/acc_grads present)."""
    import yaml

    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    root = tmp_path / "ds"
    rng = np.random.default_rng(3)
    for split in ("train", "val", "test"):
        d = root / split
        d.mkdir(parents=True)
        img = rng.uniform(0, 255, (96, 112, 3)).astype(np.uint8)
        Image.fromarray(img).save(d / "img000.jpg")
        pts = rng.uniform(0, [112, 96], (5, 2)).astype(np.float32)
        np.save(d / "img000.npy", pts)
        np.save(d / "img000_dmap.npy",
                np.zeros((96, 112), np.float32))

    ds = {"name": "den", "params": {"root": str(root), "crop_size": 64,
                                    "downsample": 1, "unit_size": 16}}
    cfg = Config.from_dict(yaml.safe_load(yaml.safe_dump({
        "seed": 0, "version": "accum_t", "mode": "simple",
        "num_epochs": 1,
        "model": {"name": "mcnn", "params": {}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 1, "num_workers": 0},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
        "accum_steps": 2,
    })))
    t = DGTrainer(cfg)
    t.build()
    assert hasattr(t.state.opt_state, "mini_step")
    assert hasattr(t.state.opt_state, "acc_grads")
