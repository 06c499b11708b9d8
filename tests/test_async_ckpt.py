"""Async checkpoint writing (train/checkpoint.py AsyncWriter).

The deferred save must be EXACT: the on-device snapshot has to decouple
the written bytes from buffers the train step later donates/invalidates,
rotation must stay ordered behind the writes, and the async file must be
byte-identical to a synchronous save of the same state.
"""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
from test_e2e import make_config, synth_root  # noqa: F401  (fixture reuse)

from dgvcc_tpu.train.checkpoint import (AsyncWriter, CheckpointRotator,
                                        save_checkpoint)


def _fake_state(val: float):
    return types.SimpleNamespace(
        params={"w": jnp.full((8,), val, jnp.float32),
                "b": jnp.arange(4, dtype=jnp.float32) * val},
        batch_stats={"bn": {"mean": jnp.zeros((4,), jnp.float32)}},
        opt_state={"m": jnp.full((8,), val / 2, jnp.float32)},
        step=jnp.asarray(int(val)),
    )


def test_async_save_matches_sync_bytes(tmp_path):
    state = _fake_state(3.0)
    sync_dir = tmp_path / "sync"
    sync_dir.mkdir()
    save_checkpoint(str(sync_dir / "last.ckpt"), state, {"epoch": 3})

    writer = AsyncWriter()
    rot = CheckpointRotator(str(tmp_path), writer=writer)
    rot.save_last(state, extra={"epoch": 3})
    rot.flush()
    a = (tmp_path / "last.ckpt").read_bytes()
    b = (sync_dir / "last.ckpt").read_bytes()
    assert a == b
    writer.close()


def test_async_save_survives_buffer_invalidation(tmp_path):
    """The train step donates the state's device buffers; the snapshot
    taken at save time must keep the deferred write exact even after
    the originals are gone (simulated here with an explicit delete —
    CPU ignores donation, deletion is the deterministic stand-in)."""
    state = _fake_state(7.0)
    expect = {k: np.asarray(v) for k, v in state.params.items()}

    writer = AsyncWriter()
    rot = CheckpointRotator(str(tmp_path), writer=writer)
    rot.save_last(state, extra={"epoch": 1})
    for leaf in jax.tree.leaves(state.params):
        leaf.delete()  # what donation does to the old buffers
    rot.flush()

    from flax import serialization

    loaded = serialization.msgpack_restore(
        (tmp_path / "last.ckpt").read_bytes())
    np.testing.assert_array_equal(loaded["params"]["w"], expect["w"])
    np.testing.assert_array_equal(loaded["params"]["b"], expect["b"])
    assert loaded["extra"]["epoch"] == 1
    writer.close()


def test_async_rotation_keeps_only_newest_best(tmp_path):
    writer = AsyncWriter()
    rot = CheckpointRotator(str(tmp_path), writer=writer)
    rot.save_best(_fake_state(1.0), epoch=1, criterion=9.5)
    rot.save_best(_fake_state(2.0), epoch=2, criterion=8.25)
    rot.flush()
    names = sorted(os.listdir(tmp_path))
    assert names == ["best_2_8.2500.ckpt"]
    writer.close()


def test_async_writer_surfaces_job_errors(tmp_path):
    import pytest

    writer = AsyncWriter()

    def boom():
        raise OSError("disk full")

    writer.submit(boom)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        writer.flush()
    # writer stays usable after the failure is surfaced
    writer.submit(lambda: None)
    writer.close()


def test_trainer_async_save_end_to_end(tmp_path, synth_root):
    """`async_save: true` trains, saves, and exact-resumes like sync."""
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "async_a"
    cfg.extra["async_save"] = True
    t1 = DGTrainer(cfg)
    assert t1.ckpt_writer is not None
    t1.build()
    t1.train(num_epochs=1)
    last = os.path.join(t1.log_dir, "last.ckpt")
    assert os.path.exists(last)  # flushed before train() returned

    cfg2 = load_config(cfg_path)
    cfg2.version = "async_b"
    t2 = DGTrainer(cfg2)
    t2.build()
    t2.load_ckpt(last)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
