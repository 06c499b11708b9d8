"""Reconstructed generation/joint/regression/discrimination modes."""

import os
from glob import glob

import numpy as np
import pytest
import yaml
from PIL import Image

from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gjds")
    rng = np.random.default_rng(5)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        d = root / split
        d.mkdir()
        for k in range(n):
            h, w = 96, 96
            Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
                d / f"img{k:03d}.jpg")
            pts = rng.uniform(0, [w, h], (10, 2)).astype(np.float32)
            np.save(d / f"img{k:03d}.npy", pts)
            np.save(d / f"img{k:03d}_dmap.npy", gaussian_density_fixed_np((h, w), pts))
    return str(root)


def make_cfg(tmp_path, synth_root, mode, model):
    ds = {"name": "den_cls", "params": {
        "root": synth_root, "crop_size": 64, "downsample": 1,
        "is_grey": False, "unit_size": 16}}
    return {
        "seed": 1, "version": f"gj_{mode}", "log_para": 1000,
        "patch_size": 1440, "mode": mode, "num_epochs": 1, "checkpoint": None,
        "model": {"name": model, "params": {"pretrained": False}},
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 2, "num_workers": 0, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "scheduler": None, "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
    }


@pytest.mark.parametrize("mode,model", [
    ("generation", "gen"),
    ("discrimination", "dgnet"),
])
def test_mode_trains(tmp_path, synth_root, mode, model):
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = Config.from_dict(make_cfg(tmp_path, synth_root, mode, model))
    t = DGTrainer(cfg)
    t.build()
    best, _ = t.train(num_epochs=1)
    assert np.isfinite(best)
    log = open(os.path.join(t.log_dir, "log.txt")).read()
    assert "Val criterion" in log


def test_joint_mode_saves_pairs(tmp_path, synth_root):
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = Config.from_dict(make_cfg(tmp_path, synth_root, "joint", "dgnet"))
    t = DGTrainer(cfg)
    t.build()
    assert t.joint
    t.train(num_epochs=1)
    assert glob(os.path.join(t.log_dir, "last_gen.ckpt"))
    assert glob(os.path.join(t.log_dir, "last_reg.ckpt"))
    assert glob(os.path.join(t.log_dir, "best_*_gen.ckpt"))

    # resume from the pair (2-list checkpoint contract)
    cfg2 = Config.from_dict(make_cfg(tmp_path, synth_root, "joint", "dgnet"))
    cfg2.version = "gj_joint2"
    t2 = DGTrainer(cfg2)
    t2.build()
    t2.load_ckpt([os.path.join(t.log_dir, "last_gen.ckpt"),
                  os.path.join(t.log_dir, "last_reg.ckpt")])
    import jax

    for a, b in zip(jax.tree.leaves(t.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_refuses_gen_only_pair(tmp_path, synth_root):
    """--task export on a joint config with a [gen_only] checkpoint must
    refuse (exporting would write random-init regressor weights)."""
    import pytest as _pytest

    from dgvcc_tpu.cli.main import _export
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = Config.from_dict(make_cfg(tmp_path, synth_root, "joint", "dgnet"))
    cfg.version = "gj_export_guard"
    cfg.checkpoint = ["gen_only.ckpt"]
    t = DGTrainer(cfg)
    with _pytest.raises(SystemExit, match="regressor checkpoint"):
        _export(t, cfg, template="x.pth", out="y.pth")


def test_generate_task_emits_restyled_images(tmp_path, synth_root):
    """--task generate writes {name}_a.jpg restyled train images into
    logs/{version}/gen — the gen_root production path (reference flow:
    trained Generator → main.py generate → datasets consume via
    gen_root aliasing, base_dataset.py:89-92)."""
    import os
    from glob import glob

    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = Config.from_dict(make_cfg(tmp_path, synth_root, "generation", "gen"))
    cfg.version = "gj_generate"
    t = DGTrainer(cfg)
    t.generate()  # random-init generator: output must still be images

    out = sorted(glob(os.path.join(t.log_dir, "gen", "*_a.jpg")))
    assert out, "generate produced no images"
    # every train image gets a restyled counterpart with the _a suffix
    n_train = len(glob(os.path.join(synth_root, "train", "*.jpg")))
    assert len(out) == n_train
    from PIL import Image
    im = Image.open(out[0])
    assert im.size[0] > 0 and im.mode == "RGB"
