"""CheckpointRotator crash-safety: write-then-purge ordering and the
staged pair write (a crash mid-save must never lose the only resumable
state or leave a mixed-epoch gen/reg pair)."""

import os
from glob import glob

import numpy as np
import pytest


def _state(seed):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from dgvcc_tpu.train.state import create_train_state

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    return create_train_state(M(), jax.random.PRNGKey(seed),
                              jnp.ones((2, 4)), optax.sgd(0.1))


def _params0(path, template):
    from dgvcc_tpu.train.checkpoint import load_checkpoint

    st, extra, _ = load_checkpoint(path, template)
    import jax
    return [np.asarray(x) for x in jax.tree.leaves(st.params)], extra


def test_pair_save_survives_crash_during_serialization(tmp_path, monkeypatch):
    """Both pair payloads stage to .tmp before EITHER rename: a crash
    while serializing the second file leaves the previous complete pair
    untouched (the old purge-first order deleted it up front, so a
    SIGKILL there lost the only resumable joint state)."""
    from flax import serialization

    from dgvcc_tpu.train.checkpoint import CheckpointRotator

    rot = CheckpointRotator(str(tmp_path))
    g1, r1 = _state(1), _state(2)
    rot.save_last_pair(g1, r1, extra={"epoch": 0})

    calls = {"n": 0}
    real = serialization.msgpack_serialize

    def boom(tree):
        calls["n"] += 1
        if calls["n"] == 2:  # the pair's second payload
            raise RuntimeError("disk full")
        return real(tree)

    monkeypatch.setattr(
        "dgvcc_tpu.train.checkpoint.serialization.msgpack_serialize", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        rot.save_last_pair(_state(3), _state(4), extra={"epoch": 1})
    monkeypatch.undo()

    # the v1 pair is intact, both files, both at epoch 0
    import jax
    for name, want in (("last_gen", g1), ("last_reg", r1)):
        got, extra = _params0(str(tmp_path / f"{name}.ckpt"), _state(9))
        assert int(np.asarray(extra["epoch"])) == 0
        for a, b in zip(got, jax.tree.leaves(want.params)):
            np.testing.assert_array_equal(a, np.asarray(b))


def test_best_rotation_purges_after_write(tmp_path, monkeypatch):
    """The rolling-best purge runs AFTER the new file is written; a
    crash during the write keeps the previous best on disk."""
    from flax import serialization

    from dgvcc_tpu.train.checkpoint import CheckpointRotator

    rot = CheckpointRotator(str(tmp_path))
    rot.save_best(_state(1), 0, 10.0)
    assert glob(str(tmp_path / "best_0_10.0000.ckpt"))

    def boom(tree):
        raise RuntimeError("disk full")

    monkeypatch.setattr(
        "dgvcc_tpu.train.checkpoint.serialization.msgpack_serialize", boom)
    with pytest.raises(RuntimeError):
        rot.save_best(_state(2), 1, 9.0)
    monkeypatch.undo()
    # the old best survived the failed rotation
    assert glob(str(tmp_path / "best_0_10.0000.ckpt"))

    # a successful rotation replaces it (exactly one best remains)
    rot.save_best(_state(2), 1, 9.0)
    bests = glob(str(tmp_path / "best_*.ckpt"))
    assert [os.path.basename(b) for b in bests] == ["best_1_9.0000.ckpt"]


def test_pair_rotation_keeps_exactly_one_pair(tmp_path):
    from dgvcc_tpu.train.checkpoint import CheckpointRotator

    rot = CheckpointRotator(str(tmp_path))
    rot.save_best_pair(_state(1), _state(2), 0, 10.0)
    rot.save_best_pair(_state(3), _state(4), 1, 9.0)
    names = sorted(os.path.basename(p)
                   for p in glob(str(tmp_path / "best_*.ckpt")))
    assert names == ["best_1_9.0000_gen.ckpt", "best_1_9.0000_reg.ckpt"]
    # rolling last pair keeps exactly the two current files too
    rot.save_last_pair(_state(5), _state(6))
    rot.save_last_pair(_state(7), _state(8))
    names = sorted(os.path.basename(p)
                   for p in glob(str(tmp_path / "last_*.ckpt")))
    assert names == ["last_gen.ckpt", "last_reg.ckpt"]
    # no stale .tmp staging files left behind
    assert not glob(str(tmp_path / "*.tmp"))
