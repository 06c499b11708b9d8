"""EMA (Polyak-averaged) shadow weights — config `ema: d`.

Beyond-reference: the shadow updates inside the fused train step
(train/state.py::TrainState.apply_gradients), eval/export/serve use the
average, checkpoints carry it.
"""

import os

import numpy as np
import pytest
import yaml


def _tiny_state(ema_decay):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from dgvcc_tpu.train.state import create_train_state

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    return create_train_state(M(), jax.random.PRNGKey(0), jnp.ones((2, 4)),
                              optax.sgd(0.1), ema_decay=ema_decay)


def test_ema_update_trajectory():
    """ema_{t} = d*ema_{t-1} + (1-d)*params_t, seeded from init."""
    import jax
    import jax.numpy as jnp

    s = _tiny_state(0.9)
    assert s.ema_params is not None
    ref_ema = jax.tree.map(np.asarray, s.params)  # seeded at init

    for _ in range(3):
        grads = jax.tree.map(jnp.ones_like, s.params)
        s = s.apply_gradients(grads)
        ref_ema = jax.tree.map(lambda e, p: 0.9 * e + 0.1 * np.asarray(p),
                               ref_ema, s.params)

    for got, want in zip(jax.tree.leaves(s.ema_params),
                         jax.tree.leaves(ref_ema)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # the shadow lags the raw params (3 SGD steps of lr*1 = 0.3 apart)
    gaps = [np.abs(np.asarray(p) - np.asarray(e)).max()
            for p, e in zip(jax.tree.leaves(s.params),
                            jax.tree.leaves(s.ema_params))]
    assert max(gaps) > 0.05


def test_ema_off_by_default():
    s = _tiny_state(0.0)
    assert s.ema_params is None and s.ema_decay is None
    import jax
    import jax.numpy as jnp

    s = s.apply_gradients(jax.tree.map(jnp.ones_like, s.params))
    assert s.ema_params is None


def test_ema_decay_validated(tmp_path):
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = {"version": "bad_ema", "model": {"name": "mcnn", "params": {}},
           "loss": {"name": "mse", "params": {}},
           "optimizer": {"name": "adam", "params": {"lr": 1e-3}},
           "mode": "simple", "num_epochs": 1, "ema": 1.5,
           "log_dir": str(tmp_path / "logs")}
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(cfg))
    t = DGTrainer(load_config(str(p)))
    with pytest.raises(ValueError, match="ema"):
        t.build()


def test_ema_checkpoint_roundtrip(tmp_path):
    """Save/load preserves the shadow; a pre-EMA checkpoint seeds it
    from params; an EMA checkpoint into an ema-off run is ignored."""
    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    s = _tiny_state(0.9)
    for _ in range(2):
        s = s.apply_gradients(jax.tree.map(jnp.ones_like, s.params))
    path = str(tmp_path / "ema.ckpt")
    save_checkpoint(path, s)

    fresh = _tiny_state(0.9)
    loaded, _, warns = load_checkpoint(path, fresh)
    assert not warns
    for got, want in zip(jax.tree.leaves(loaded.ema_params),
                         jax.tree.leaves(s.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # ema ckpt → ema-off run: params restore, shadow ignored w/ warning
    off = _tiny_state(0.0)
    loaded_off, _, warns = load_checkpoint(path, off)
    assert loaded_off.ema_params is None
    assert any("ema" in w for w in warns)
    # ... and strict load still passes (derived state, not corruption)
    load_checkpoint(path, off, strict=True)

    # pre-EMA ckpt → ema-on run: shadow seeded from the restored params
    plain = _tiny_state(0.0)
    plain = plain.apply_gradients(jax.tree.map(jnp.ones_like, plain.params))
    plain_path = str(tmp_path / "plain.ckpt")
    save_checkpoint(plain_path, plain)
    seeded, _, warns = load_checkpoint(plain_path, _tiny_state(0.9))
    assert any("seeded" in w for w in warns)
    for got, want in zip(jax.tree.leaves(seeded.ema_params),
                         jax.tree.leaves(seeded.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    load_checkpoint(plain_path, _tiny_state(0.9), strict=True)


@pytest.fixture(scope="module")
def synth_root(synth_root_factory):
    return synth_root_factory("emads", seed=11)


def _ema_cfg(tmp_path, synth_root, **over):
    # downsample 4 = mcnn's output stride (the reference pairs dataset
    # downsample with the model's resolution the same way)
    ds = {"name": "den", "params": {"root": synth_root, "crop_size": 64,
                                    "downsample": 4, "is_grey": False,
                                    "unit_size": 16, "pre_resize": 1}}
    cfg = {
        "seed": 7, "version": "ema_e2e", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 2,
        "checkpoint": None, "ema": 0.8,
        "model": {"name": "mcnn", "params": {}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 2, "num_workers": 0, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "mse", "params": {"reduction": "mean"}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-3}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }
    cfg.update(over)
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), cfg


def test_ema_trainer_end_to_end(tmp_path, synth_root):
    """Training with `ema:` keeps a lagging shadow, evaluates it, saves
    it in last.ckpt, and resumes it exactly."""
    import jax
    from flax import serialization

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, cfg = _ema_cfg(tmp_path, synth_root)
    t = DGTrainer(load_config(cfg_path))
    t.build()
    t.train()

    assert t.state.ema_params is not None
    gaps = [np.abs(np.asarray(p, np.float32) - np.asarray(e, np.float32)).max()
            for p, e in zip(jax.tree.leaves(t.state.params),
                            jax.tree.leaves(t.state.ema_params))]
    assert max(gaps) > 0  # the shadow lags
    # eval/export weights ARE the shadow
    v = t._variables()
    got = jax.tree.leaves(v["params"])
    want = jax.tree.leaves(t.state.ema_params)
    assert all(a is b or np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(got, want))
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "EMA enabled" in log

    # the checkpoint carries the shadow
    ckpt = os.path.join(t.log_dir, "last.ckpt")
    raw = serialization.msgpack_restore(open(ckpt, "rb").read())
    assert "ema_params" in raw

    # exact resume of the shadow
    t2 = DGTrainer(load_config(cfg_path))
    t2.build()
    t2.load_ckpt(ckpt)
    for a, b in zip(jax.tree.leaves(t.state.ema_params),
                    jax.tree.leaves(t2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_data_parallel_mesh(tmp_path, synth_root):
    """EMA under mesh: {data: N}: the shadow updates inside the
    shard_map'd donated step, stays replicated, and lags the raw
    params (donation-aliasing regression guard for the sharded path)."""
    import jax

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = _ema_cfg(tmp_path, synth_root, num_epochs=1,
                           version="ema_dp",
                           mesh={"data": 2},
                           train_loader={"batch_size": 2, "num_workers": 0,
                                         "shuffle": True})
    t = DGTrainer(load_config(cfg_path))
    t.build()
    assert t.dp_mesh is not None
    t.train()
    assert t.state.ema_params is not None
    gaps = [np.abs(np.asarray(p, np.float32) - np.asarray(e, np.float32)).max()
            for p, e in zip(jax.tree.leaves(t.state.params),
                            jax.tree.leaves(t.state.ema_params))]
    assert max(gaps) > 0
    for leaf in jax.tree.leaves(t.state.ema_params):
        assert leaf.sharding.is_fully_replicated


def test_serve_prefers_ema_weights(tmp_path, synth_root):
    """VideoCounter.from_checkpoint on an EMA checkpoint serves the
    averaged weights, not the raw params."""
    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.serve import VideoCounter
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = _ema_cfg(tmp_path, synth_root, num_epochs=1)
    t = DGTrainer(load_config(cfg_path))
    t.build()
    t.train()
    ckpt = os.path.join(t.log_dir, "last.ckpt")

    counter = VideoCounter.from_checkpoint("mcnn", ckpt, dtype=jnp.float32)
    got = list(jax.tree.leaves(counter.variables["params"]))
    want = list(jax.tree.leaves(t.state.ema_params))
    raw = list(jax.tree.leaves(t.state.params))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), rtol=1e-6)
    # and they differ from the raw params somewhere
    assert any(np.abs(np.asarray(a, np.float32)
                      - np.asarray(b, np.float32)).max() > 0
               for a, b in zip(want, raw))
