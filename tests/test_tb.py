"""Optional TensorBoard scalar logging (core/tb.py, `tensorboard: true`).

The reference has no experiment tracking beyond log.txt; TB scalars are
the SURVEY §5 "optional TB" extra. Round-trips real event files through
tensorboard's own reader.
"""

import os

import numpy as np
import pytest

from dgvcc_tpu.core.tb import ScalarWriter


def _read_scalars(logdir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(logdir)
    acc.Reload()
    return {tag: [(e.step, e.value) for e in acc.Scalars(tag)]
            for tag in acc.Tags()["scalars"]}


def test_scalar_writer_roundtrip(tmp_path):
    d = str(tmp_path / "tb")
    w = ScalarWriter(d, enabled=True)
    w.scalar("train/loss_total", 1.5, 0)
    w.scalar("train/loss_total", 0.75, 1)
    w.scalars({"criterion": 12.0, "mse": 144.0}, 0, prefix="val/")
    w.close()

    scalars = _read_scalars(d)
    assert [s for s, _ in scalars["train/loss_total"]] == [0, 1]
    np.testing.assert_allclose([v for _, v in scalars["train/loss_total"]],
                               [1.5, 0.75], rtol=1e-6)
    assert scalars["val/criterion"][0][1] == pytest.approx(12.0)
    assert scalars["val/mse"][0][1] == pytest.approx(144.0)


def test_scalar_writer_disabled_is_inert(tmp_path):
    d = str(tmp_path / "tb_off")
    w = ScalarWriter(d, enabled=False)
    w.scalar("x", 1.0, 0)
    w.scalars({"y": 2.0}, 0)
    w.flush()
    w.close()
    assert not os.path.exists(d)  # lazy import never fired


def test_scalar_writer_survives_write_failure(tmp_path):
    msgs = []
    w = ScalarWriter(str(tmp_path / "tb_err"), enabled=True,
                     warn=msgs.append)
    w.scalar("ok", 1.0, 0)

    class Boom:
        def add_scalar(self, *a, **k):
            raise RuntimeError("disk full")

    w._writer = Boom()
    w.scalar("bad", 2.0, 1)  # must not raise
    assert not w.enabled and msgs  # disabled itself, warned once
    w.scalar("after", 3.0, 2)  # inert now


def test_scalar_writer_guards_flush_close_and_construction(tmp_path):
    """Review findings: flush/close after a failure must not raise (a
    close in a finally-block would mask the real exception), and an
    unwritable logdir must disable logging instead of killing the run."""
    msgs = []

    class Boom:
        def add_scalar(self, *a, **k):
            raise RuntimeError("disk full")

        def flush(self):
            raise RuntimeError("still broken")

        def close(self):
            raise RuntimeError("still broken")

    w = ScalarWriter(str(tmp_path / "tb"), enabled=True, warn=msgs.append)
    w._writer = Boom()
    w.scalar("x", 1.0, 0)
    w.flush()  # must not raise
    w.close()  # must not raise
    assert w._writer is None and msgs

    # construction failure: logdir is a FILE, SummaryWriter mkdir fails
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    w2 = ScalarWriter(str(blocker / "tb"), enabled=True, warn=msgs.append)
    w2.scalar("x", 1.0, 0)  # must not raise
    assert not w2.enabled


def test_trainer_writes_tb_scalars(tmp_path, synth_root_tb):
    """e2e: `tensorboard: true` in a config → train+val+test scalars."""
    import yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    ds = {"name": "den", "params": {"root": synth_root_tb, "crop_size": 64,
                                    "downsample": 4, "is_grey": False,
                                    "unit_size": 16, "pre_resize": 1}}
    cfg = {
        "seed": 7, "version": "tbtest", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 2,
        "checkpoint": None, "tensorboard": True,
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
    trainer.train_and_test()

    tb_dir = os.path.join(str(tmp_path / "logs"), "tbtest", "tb")
    scalars = _read_scalars(tb_dir)
    for tag in ("train/loss_total", "train/lr", "val/criterion", "val/mse",
                "time/epoch_s", "test/mae", "test/mse"):
        assert tag in scalars, (tag, sorted(scalars))
    # one point per epoch, at the right steps
    assert [s for s, _ in scalars["train/loss_total"]] == [0, 1]
    assert [s for s, _ in scalars["val/criterion"]] == [0, 1]
    # the logged lr follows the step scheduler
    lrs = [v for _, v in scalars["train/lr"]]
    assert lrs[0] == pytest.approx(1e-4, rel=1e-5)
    assert lrs[1] == pytest.approx(9e-5, rel=1e-4)


@pytest.fixture(scope="module")
def synth_root_tb(synth_root_factory):
    return synth_root_factory("tbds", seed=3)
