"""End-to-end: config → CLI → train_test → logs + checkpoints on disk."""

import os
from glob import glob

import numpy as np
import pytest
import yaml
from PIL import Image

from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2eds")
    rng = np.random.default_rng(1)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        d = root / split
        d.mkdir()
        for k in range(n):
            h, w = 96, 112
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            Image.fromarray(img).save(d / f"img{k:03d}.jpg")
            pts = rng.uniform(0, [w, h], (12, 2)).astype(np.float32)
            np.save(d / f"img{k:03d}.npy", pts)
            np.save(d / f"img{k:03d}_dmap.npy", gaussian_density_fixed_np((h, w), pts))
    return str(root)


def make_config(tmp_path, synth_root, mode="final", model="final"):
    ds = {
        "name": "den_cls",
        "params": {"root": synth_root, "crop_size": 64, "downsample": 1,
                   "is_grey": False, "unit_size": 16, "pre_resize": 1},
    }
    cfg = {
        "seed": 2112,
        "version": "test_e2e",
        "device": "tpu",
        "log_para": 1000,
        "patch_size": 1440,
        "mode": mode,
        "num_epochs": 2,
        "checkpoint": None,
        "model": {"name": model, "params": {"pretrained": False, "mem_size": 64,
                                            "mem_dim": 32}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 2, "num_workers": 2, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "mse", "params": {"reduction": "mean"}},
        "optimizer": {"name": "adamw", "params": {"lr": 0.001, "weight_decay": 0.0001}},
        "scheduler": {"name": "cosine", "params": {"T_max": 2, "eta_min": 1e-5}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), cfg


def test_cli_train_test_end_to_end(tmp_path, synth_root):
    from dgvcc_tpu.cli.main import run

    cfg_path, cfg = make_config(tmp_path, synth_root)
    run(cfg_path, "train_test")

    log_dir = os.path.join(cfg["log_dir"], "test_e2e")
    logtxt = open(os.path.join(log_dir, "log.txt")).read()
    assert "Start training and testing" in logtxt
    assert "Val criterion" in logtxt
    assert "Testing results" in logtxt
    assert glob(os.path.join(log_dir, "last.ckpt"))
    assert glob(os.path.join(log_dir, "best_*.ckpt"))
    assert glob(os.path.join(log_dir, "cfg.yml"))  # config snapshot


def test_checkpoint_resume_roundtrip(tmp_path, synth_root):
    import jax.numpy as jnp
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer
    from dgvcc_tpu.train.checkpoint import load_checkpoint

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "resume_a"
    t1 = DGTrainer(cfg)
    t1.build()
    t1.train(num_epochs=1)

    cfg2 = load_config(cfg_path)
    cfg2.version = "resume_b"
    t2 = DGTrainer(cfg2)
    t2.build()
    last = os.path.join(t1.log_dir, "last.ckpt")
    t2.load_ckpt(last)
    # restored params match exactly
    import jax
    for a, b in zip(jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (reference can't do this)
    for a, b in zip(jax.tree.leaves(t1.state.opt_state), jax.tree.leaves(t2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exact_resume_continues_epoch_and_best(tmp_path, synth_root):
    """Resume restores epoch counter, best criterion, and scheduler
    state — the run continues where it stopped instead of restarting."""
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "resume_exact_a"
    cfg.num_epochs = 2
    t1 = DGTrainer(cfg)
    t1.build()
    best1, be1 = t1.train()

    cfg2 = load_config(cfg_path)
    cfg2.version = "resume_exact_a"  # same log dir
    cfg2.num_epochs = 3
    cfg2.checkpoint = os.path.join(t1.log_dir, "last.ckpt")
    t2 = DGTrainer(cfg2)
    t2.build()
    t2.train()
    log = open(os.path.join(t2.log_dir, "log.txt")).read()
    assert "Resuming from epoch 1" in log
    # only epoch 2 ran in the second session
    assert log.count("Epoch 2: Training loss") == 1
    assert "Epoch 0: Training loss" in log.split("Resuming")[0]
    # scheduler advanced: cosine epoch counter restored (2 steps taken)
    assert t2.scheduler.epoch >= 3


def test_bayesian_training_end_to_end(tmp_path, synth_root):
    """BL-VGG + bay dataset + Bayesian loss through the trainer."""
    import yaml as _yaml
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    ds_bay = {"name": "bay", "params": {"root": synth_root, "crop_size": 64,
                                        "downsample": 8, "unit_size": 16}}
    ds_den = {"name": "den", "params": {"root": synth_root, "crop_size": 64,
                                        "downsample": 8, "unit_size": 16}}
    cfg = Config.from_dict({
        "seed": 3, "version": "bl_e2e", "log_para": 1000, "patch_size": 1440,
        "mode": "simple", "num_epochs": 1, "checkpoint": None,
        "model": {"name": "bl", "params": {"pretrained": False}},
        "train_dataset": ds_bay, "val_dataset": ds_den, "test_dataset": ds_den,
        "train_loader": {"batch_size": 2, "num_workers": 0, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "bl", "params": {"sigma": 8.0, "c_size": 64,
                                          "stride": 8, "background_ratio": 0.15,
                                          "use_background": True}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-5}},
        "scheduler": None, "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    })
    t = DGTrainer(cfg)
    t.build()
    best, _ = t.train(num_epochs=1)
    assert np.isfinite(best)


def test_mesh_config_data_parallel_training(tmp_path, synth_root):
    """config mesh: {data: 8} trains over the virtual device mesh."""
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "dp_mesh"
    cfg.mesh = {"data": 4}  # batch must divide by the data axis
    cfg.train_loader["batch_size"] = 4
    t = DGTrainer(cfg)
    t.build()
    assert t.dp_mesh is not None
    # per-epoch val/test counts through the mesh-sharded tile counter
    from dgvcc_tpu.parallel.eval import ShardedTiledCounter

    assert isinstance(t.counter, ShardedTiledCounter)
    best, _ = t.train(num_epochs=1)
    assert np.isfinite(best)
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "Data parallel over 4 devices" in log

def test_mesh_config_2d_training(tmp_path, synth_root):
    """config mesh: {data: 2, model: 2} trains over a 2-D mesh — batch
    sharded over 'data', memory bank over 'model' — end to end, with
    single-device eval on the tp-free twin."""
    import jax
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "mesh2d"
    cfg.mesh = {"data": 2, "model": 2}
    cfg.train_loader["batch_size"] = 2
    t = DGTrainer(cfg)
    t.build()
    assert t.mesh2d is not None and t.dp_mesh is None
    assert t.tp_model is not None
    best, _ = t.train(num_epochs=1)
    assert np.isfinite(best)
    # after a step the bank (and its adam moments) live sharded on the mesh
    from dgvcc_tpu.parallel.tp import MODEL_AXIS

    spec = t.state.params["memory"]["mem"].sharding.spec
    assert MODEL_AXIS in tuple(spec), spec
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "2-D mesh: data=2 x model=2" in log
    # checkpoints reassemble the bank to the full prototype count
    from dgvcc_tpu.train.checkpoint import load_checkpoint

    s2, _, _ = load_checkpoint(os.path.join(t.log_dir, "last.ckpt"),
                               t.state)
    assert np.asarray(s2.params["memory"]["mem"]).shape[-1] == 64


def test_mesh_model_axis_rejects_unsupported(tmp_path, synth_root):
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root, mode="simple")
    import yaml as _yaml
    d = _yaml.safe_load(open(cfg_path))
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    ds["params"] = dict(ds["params"], downsample=4)
    d["model"] = {"name": "mcnn", "params": {"pretrained": False}}
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["mesh"] = {"data": 2, "model": 2}
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    t = DGTrainer(load_config(cfg_path))
    with pytest.raises(ValueError, match="model-axis|tp_axis|memory-bank"):
        t.build()


def test_base_model_tests_every_epoch(tmp_path, synth_root):
    """BaseTrainer protocol parity (basetrainer.py:149-173): dgnet-family
    configs test after EVERY epoch in train_and_test, not only on val
    improvement."""
    import yaml as _yaml
    from dgvcc_tpu.cli.main import run

    cfg_path, cfg = make_config(tmp_path, synth_root, mode="simple",
                                model="dgnet")
    d = _yaml.safe_load(open(cfg_path))
    d["model"] = {"name": "dgnet", "params": {"pretrained": False}}
    d["version"] = "base_epoch_test"
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    run(cfg_path, "train_test")

    logtxt = open(os.path.join(cfg["log_dir"], "base_epoch_test",
                               "log.txt")).read()
    assert logtxt.count("Testing results:") == 2  # num_epochs = 2

    # the DG family keeps the improvement-gated protocol: knob override
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    c2 = load_config(cfg_path)
    c2.extra["test_every_epoch"] = False
    assert DGTrainer(c2)._test_every_epoch() is False
    c2.extra.pop("test_every_epoch")
    assert DGTrainer(c2)._test_every_epoch() is True  # dgnet default
    c2.model = {"name": "final", "params": {}}
    assert DGTrainer(c2)._test_every_epoch() is False


def test_launcher_dry_run_and_env(tmp_path, capsys):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import launch
    finally:
        sys.path.pop(0)

    rc = launch.main(["--dry-run", "--task", "train", "--devices", "0,1",
                      "--ckpt", "logs/x/last.ckpt",
                      "a.yml", "b.yml", "c.yml"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device pool: [0,1]" in out
    assert out.count("dgvcc_tpu.cli.main") == 3
    # --ckpt is forwarded with the flag the CLI actually accepts
    assert out.count("--ckpt logs/x/last.ckpt") == 3

    env = launch.build_env("2")
    assert env["TPU_VISIBLE_CHIPS"] == "2"
    assert launch.build_env(None).get("TPU_VISIBLE_CHIPS") is None \
        or "TPU_VISIBLE_CHIPS" in os.environ

    # every flag the launcher emits parses in the CLI it targets
    from dgvcc_tpu.cli.main import build_parser
    ns = build_parser().parse_args(
        ["--task", "train", "--config", "a.yml",
         "--ckpt", "logs/x/last.ckpt"])
    assert ns.ckpt == "logs/x/last.ckpt"


def test_launcher_resume_ckpt_discovery(tmp_path):
    """--supervise finds the run's own rolling checkpoint from the
    config's log_dir/version: single last.ckpt, the joint-mode
    last_gen/last_reg pair (comma-joined), or None before any save."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import launch
    finally:
        sys.path.pop(0)

    cfg = {"log_dir": str(tmp_path / "logs"), "version": "v"}
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(cfg))
    d = tmp_path / "logs" / "v"
    d.mkdir(parents=True)

    assert launch.resume_ckpt(str(p)) is None          # nothing saved yet
    assert launch.resume_ckpt("/nonexistent.yml") is None

    (d / "last.ckpt").write_bytes(b"x")
    assert launch.resume_ckpt(str(p)) == str(d / "last.ckpt")

    (d / "last_gen.ckpt").write_bytes(b"x")
    (d / "last_reg.ckpt").write_bytes(b"x")
    pair = launch.resume_ckpt(str(p))                  # joint pair wins
    assert pair == f"{d / 'last_gen.ckpt'},{d / 'last_reg.ckpt'}"

    # and the CLI splits the pair back into the [gen, reg] list form
    from dgvcc_tpu.cli.main import parse_ckpt_override
    assert parse_ckpt_override(pair) == [str(d / "last_gen.ckpt"),
                                         str(d / "last_reg.ckpt")]
    assert parse_ckpt_override("single.ckpt") == "single.ckpt"


def test_early_stop_halts_on_plateau(tmp_path, synth_root):
    """`early_stop: N` ends training once the val criterion stalls for
    N epochs (a scripted criterion sequence makes the plateau exact —
    real val numbers jitter with BN running stats)."""
    import yaml as _yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, cfg = make_config(tmp_path, synth_root)
    d = _yaml.safe_load(open(cfg_path))
    d.update(version="earlystop", num_epochs=20, early_stop=2)
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    t = DGTrainer(load_config(cfg_path))
    t.build()
    crits = iter([5.0, 5.0, 5.0, 5.0, 5.0, 5.0])  # improve once, stall
    t.validate = lambda epoch, best: next(crits)
    t.train()
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    # epoch 0 improves (5.0 < 1e10, best_epoch=0), epochs 1-2 stall
    assert "Early stopping at epoch 2" in log
    assert log.count("Training loss") == 3  # 20 configured, 3 run


def test_test_report_csv(tmp_path, synth_root):
    """`test_report: true` writes a worst-first per-image CSV whose
    aggregate matches the logged MAE."""
    import csv

    import yaml as _yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, cfg = make_config(tmp_path, synth_root)
    d = _yaml.safe_load(open(cfg_path))
    d.update(version="testreport", test_report=True)
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    t = DGTrainer(load_config(cfg_path))
    t.build()
    metrics = t.test()

    path = os.path.join(t.log_dir, "test_report.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2  # synth test split size
    errs = [float(r["abs_err"]) for r in rows]
    assert errs == sorted(errs, reverse=True)  # worst-first
    assert np.mean(errs) == pytest.approx(metrics["mae"], rel=1e-6)
    for r in rows:
        assert float(r["abs_err"]) == pytest.approx(
            abs(float(r["pred_count"]) - float(r["gt_count"])), abs=1e-3)


def test_supervised_launch_recovers_from_crash(tmp_path, synth_root):
    """launch.py --supervise N: a training process SIGKILLed mid-run is
    restarted by the supervisor, resumes from its own last.ckpt, and
    completes (launcher rc 0, 'Resuming from epoch' in the run log).
    SIGKILL specifically — SIGTERM would take the trainer's graceful
    path (rc 0) and never reach the supervisor."""
    import re
    import signal
    import subprocess
    import sys
    import time

    cfg_path, cfg = make_config(tmp_path, synth_root)
    c = yaml.safe_load(open(cfg_path))
    # subprocess runs don't see conftest's CPU pin — the config's
    # device key must force it (cli/main.py honors device: cpu)
    c.update(device="cpu", version="supervised", num_epochs=8)
    open(cfg_path, "w").write(yaml.safe_dump(c))

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    launcher = os.path.join(os.path.dirname(__file__), "..",
                            "scripts", "launch.py")
    out_path = tmp_path / "launch.out"
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            [sys.executable, launcher, "--task", "train",
             "--supervise", "2", cfg_path],
            stdout=out, stderr=subprocess.STDOUT, env=env)
    log_dir = os.path.join(cfg["log_dir"], "supervised")
    last = os.path.join(log_dir, "last.ckpt")
    try:
        # wait for the first epoch's rolling save, then SIGKILL the
        # TRAINING process (pid from the launcher's start line)
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline and not os.path.exists(last):
            assert proc.poll() is None, open(out_path).read()
            time.sleep(0.3)
        assert os.path.exists(last), open(out_path).read()
        pid = int(re.search(r"pid=(\d+)", open(out_path).read()).group(1))
        os.kill(pid, signal.SIGKILL)
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()

    out_text = open(out_path).read()
    assert rc == 0, out_text
    assert "restart 1/2" in out_text, out_text
    assert "resuming from" in out_text, out_text
    log = open(os.path.join(log_dir, "log.txt")).read()
    assert "Resuming from epoch" in log
    assert "End training" in log


def test_preemption_graceful_save(tmp_path, synth_root):
    """SIGTERM during training sets the flag (handler test), and a
    mid-epoch preemption saves last.ckpt for the last COMPLETED epoch
    so resume redoes the interrupted one."""
    import signal

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.checkpoint import load_checkpoint
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "preempt"
    t = DGTrainer(cfg)
    t.build()
    t.train(num_epochs=1)  # epoch 0 completes, last.ckpt at epoch 0

    # the signal handler inside the shutdown context sets the flag
    with t._graceful_shutdown(lambda: None):
        assert not t._preempted
        os.kill(os.getpid(), signal.SIGTERM)
        assert t._preempted
    # handler restored: SIGTERM outside the context is the default again
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.default_int_handler,
                                                signal.Handlers.SIG_DFL)

    # mid-epoch preemption: the batch-boundary check saves epoch-1
    t._preempted = True
    best, bep = t.train_epoch(1, 10.0, 0)
    assert (best, bep) == (10.0, 0)  # unchanged — epoch 1 didn't finish
    _, extra, _ = load_checkpoint(os.path.join(t.log_dir, "last.ckpt"),
                                  t.state)
    assert int(np.asarray(extra["epoch"])) == 0  # resume redoes epoch 1
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "Preemption: saved last.ckpt at epoch 0 (mid-epoch stop)" in log


def test_quantized_test_task(tmp_path, synth_root):
    """Config extra `test_quantized: true` routes the test task through
    the int8 PTQ graph; metrics stay finite and the fp validate counter
    is untouched."""
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "quant_test"
    cfg.extra["test_quantized"] = True
    t = DGTrainer(cfg)
    t.build()
    t.train(num_epochs=1)
    fp_counter = t.counter
    t.test()
    assert t.counter is fp_counter  # validate path untouched
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "int8 PTQ" in log and "Testing results" in log
    import re

    mae = float(re.search(r"Testing results: mae: ([\d.]+)", log).group(1))
    assert np.isfinite(mae)


def test_load_ckpt_pair_validation(tmp_path, synth_root):
    """A malformed pair-checkpoint list errors with a message, and a
    1-element [gen] list is accepted (dgtrainer.py:35-41 indexing)."""
    import pytest as _pytest
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "pairval"
    t = DGTrainer(cfg)
    t.build()
    with _pytest.raises(ValueError, match="pair checkpoint"):
        t.load_ckpt(["a", "b", "c"])
    t.load_ckpt([None])  # 1-element: gen only (no-op for non-joint)


def test_progress_line():
    """utils.misc.progress: easy_track parity — emits a CR status line
    when enabled, total silence when not a TTY."""
    import io

    from dgvcc_tpu.utils.misc import progress

    buf = io.StringIO()
    out = list(progress(range(5), "Testing...", enabled=True, stream=buf,
                        min_interval=0.0))
    assert out == list(range(5))
    s = buf.getvalue()
    assert "Testing..." in s and "5/5" in s and "100%" in s
    assert s.endswith("\n")

    quiet = io.StringIO()  # StringIO has no isatty=True → silent
    list(progress(range(3), "x", stream=quiet))
    assert quiet.getvalue() == ""


def test_basetrainer_family_eval_tile_default(tmp_path, synth_root):
    """BaseTrainer-family models honor the reference's hard-coded 800px
    predict tiling (basetrainer.py:51-66); DG-family models use the
    config patch_size; eval_patch_size overrides both."""
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root)
    cfg = load_config(cfg_path)
    cfg.version = "tile800_dg"
    t = DGTrainer(cfg)
    t.build()
    assert t.counter.patch_size == cfg.patch_size  # DG family: config

    cfg2 = load_config(cfg_path)
    cfg2.version = "tile800_base"
    cfg2.model = {"name": "mcnn", "params": {"pretrained": False}}
    cfg2.mode = "simple"
    t2 = DGTrainer(cfg2)
    t2.build()
    assert t2.counter.patch_size == 800  # BaseTrainer family: 800

    cfg3 = load_config(cfg_path)
    cfg3.version = "tile800_override"
    cfg3.model = {"name": "mcnn", "params": {"pretrained": False}}
    cfg3.mode = "simple"
    cfg3.extra["eval_patch_size"] = 512
    t3 = DGTrainer(cfg3)
    t3.build()
    assert t3.counter.patch_size == 512


def test_quantized_test_task_baseline(tmp_path, synth_root):
    """test_quantized now covers the conv(+BN) baselines: an mcnn run's
    int8 test path produces finite metrics close to the fp test (mcnn
    falls back to bf16 under selective quantization — the plumbing and
    the metric-neutrality contract are what's exercised)."""
    import re
    import yaml as _yaml

    from dgvcc_tpu.cli.main import run
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root, mode="simple")
    d = _yaml.safe_load(open(cfg_path))
    d["model"] = {"name": "mcnn", "params": {"pretrained": False}}
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    ds["params"] = dict(ds["params"], downsample=4)
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["version"] = "quant_base"
    open(cfg_path, "w").write(_yaml.safe_dump(d))

    cfg = load_config(cfg_path)
    t = DGTrainer(cfg)
    t.build()
    t.train(num_epochs=1)
    t.test()
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    mae_fp = float(re.search(r"Testing results: mae: ([\d.]+)", log).group(1))

    cfg2 = load_config(cfg_path)
    cfg2.version = "quant_base_int8"
    cfg2.extra["test_quantized"] = True
    cfg2.checkpoint = os.path.join(t.log_dir, "last.ckpt")
    t2 = DGTrainer(cfg2)
    t2.build()
    t2.load_ckpt(cfg2.checkpoint)
    t2.test()
    log2 = open(os.path.join(t2.log_dir, "log.txt")).read()
    assert "int8 PTQ" in log2
    mae_q = float(re.search(r"Testing results: mae: ([\d.]+)", log2).group(1))
    assert np.isfinite(mae_q)
    # metric-neutral: same weights, same 800px eval tiling both paths
    assert abs(mae_q - mae_fp) <= 0.05 * max(mae_fp, 1.0), (mae_q, mae_fp)


def test_cli_export_task_roundtrip(tmp_path, synth_root):
    """--task export: a TPU-trained mcnn checkpoint exports to a .pth the
    actual reference module strict-loads, with forward parity."""
    import torch
    import yaml as _yaml

    import jax.numpy as jnp
    from dgvcc_tpu.cli.main import run
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    from reference_oracle import ref_import

    cfg_path, _ = make_config(tmp_path, synth_root, mode="simple")
    d = _yaml.safe_load(open(cfg_path))
    d["model"] = {"name": "mcnn", "params": {"pretrained": False}}
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    ds["params"] = dict(ds["params"], downsample=4)
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["version"] = "export_e2e"
    open(cfg_path, "w").write(_yaml.safe_dump(d))

    cfg = load_config(cfg_path)
    t = DGTrainer(cfg)
    t.build()
    t.train(num_epochs=1)
    last = os.path.join(t.log_dir, "last.ckpt")

    MC = ref_import("models.baselines.MCNN")
    ref = MC.MCNN()
    template = str(tmp_path / "template.pth")
    torch.save(ref.state_dict(), template)
    out = str(tmp_path / "exported.pth")
    run(cfg_path, "export", ckpt=last, template=template, out=out)

    ref.load_state_dict(torch.load(out, weights_only=True), strict=True)
    ref.eval()
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        golden = ref(torch.tensor(x)).numpy()
    ours = np.transpose(
        np.asarray(t.model.apply(t._variables(),
                                 jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_export_rejects_wrong_family_checkpoint(tmp_path, synth_root):
    """--task export must fail LOUDLY when the flax checkpoint doesn't
    match the config's model (non-strict merge would otherwise export
    random-init weights into a valid-looking .pth)."""
    import yaml as _yaml

    from dgvcc_tpu.cli.main import run
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    # train a CSRNet for one epoch → wrong-family ckpt for an mcnn config
    cfg_path, _ = make_config(tmp_path, synth_root, mode="simple")
    d = _yaml.safe_load(open(cfg_path))
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    ds["params"] = dict(ds["params"], downsample=8)
    d["model"] = {"name": "csrnet", "params": {"pretrained": False}}
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["version"] = "export_wrongfam"
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    t = DGTrainer(load_config(cfg_path))
    t.build()
    t.train(num_epochs=1)
    wrong = os.path.join(t.log_dir, "last.ckpt")

    d["model"] = {"name": "mcnn", "params": {"pretrained": False}}
    ds["params"] = dict(ds["params"], downsample=4)
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["version"] = "export_wrongfam2"
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    with pytest.raises(ValueError, match="strict load failed"):
        run(cfg_path, "export", ckpt=wrong,
            template=str(tmp_path / "unused.pth"),
            out=str(tmp_path / "never.pth"))


def test_nonjoint_single_list_checkpoint_loads(tmp_path, synth_root):
    """checkpoint: [path] on a non-joint config loads the model (it used
    to fall into the gen/reg pair branch and silently load nothing)."""
    import yaml as _yaml

    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg_path, _ = make_config(tmp_path, synth_root, mode="simple")
    d = _yaml.safe_load(open(cfg_path))
    ds = dict(d["train_dataset"]); ds["name"] = "den"
    ds["params"] = dict(ds["params"], downsample=4)
    d["model"] = {"name": "mcnn", "params": {"pretrained": False}}
    d["train_dataset"] = d["val_dataset"] = d["test_dataset"] = ds
    d["version"] = "onelist"
    open(cfg_path, "w").write(_yaml.safe_dump(d))
    cfg = load_config(cfg_path)
    t = DGTrainer(cfg)
    t.build()
    t.train(num_epochs=1)
    last = os.path.join(t.log_dir, "last.ckpt")
    trained = np.asarray(
        list(jax_tree_leaves(t.state.params))[0])

    t2 = DGTrainer(cfg)
    t2.build()
    before = np.asarray(list(jax_tree_leaves(t2.state.params))[0])
    assert not np.array_equal(before, trained)  # fresh init differs
    t2.load_ckpt([last], strict=True)
    after = np.asarray(list(jax_tree_leaves(t2.state.params))[0])
    np.testing.assert_array_equal(after, trained)


def jax_tree_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_cli_vis_task(tmp_path, synth_root):
    """--task vis writes per-image panel PNGs (dgtrainer.py:239-299
    contract: the figure plus Cls/BCls/Pred dumps for cls-headed
    models) into logs/{version}/vis."""
    from dgvcc_tpu.cli.main import run

    cfg_path, cfg = make_config(tmp_path, synth_root)
    run(cfg_path, "vis")

    vis_dir = os.path.join(cfg["log_dir"], "test_e2e", "vis")
    pngs = sorted(os.listdir(vis_dir))
    assert pngs, "vis produced no files"
    # 'final' has a cls head → panel + Cls/BCls/Pred dumps per image
    stems = {p[:-4].split("_")[0] for p in pngs}
    for stem in stems:
        mine = [p for p in pngs if p.startswith(stem)]
        assert f"{stem}.png" in mine, mine  # the 2x3 panel figure
        assert any(p.endswith("_Cls.png") for p in mine), mine
        assert any(p.endswith("_BCls.png") for p in mine), mine
        assert any("_Pred_" in p for p in mine), mine
