"""Data pipeline tests on a synthetic on-disk dataset."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from dgvcc_tpu.core.registry import DATASETS
import dgvcc_tpu.data  # noqa: F401  (registers datasets)
from dgvcc_tpu.data.loader import DataLoader
from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("val", 3), ("test", 2)):
        d = root / split
        d.mkdir()
        for k in range(n):
            h = int(rng.integers(100, 180))
            w = int(rng.integers(120, 200))
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            Image.fromarray(img).save(d / f"img{k:03d}.jpg")
            npts = int(rng.integers(0, 30))
            pts = rng.uniform(0, [w, h], (npts, 2)).astype(np.float32)
            np.save(d / f"img{k:03d}.npy", pts)
            dmap = gaussian_density_fixed_np((h, w), pts)
            np.save(d / f"img{k:03d}_dmap.npy", dmap)
    # domain lists for JHU-style datasets
    (root / "domains").mkdir()
    for phase in ("train", "val"):
        fns = sorted(str(p) for p in (root / phase).glob("*.jpg"))
        (root / "domains" / f"foo_{phase}.txt").write_text("\n".join(fns))
    return str(root)


CROP = 64


def test_den_dataset_train_sample(synth_root):
    ds = DATASETS.build("den", root=synth_root, crop_size=CROP, downsample=1,
                        method="train", unit_size=16)
    assert len(ds) == 6
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s["img1"].shape == (CROP, CROP, 3)
    assert s["dmap"].shape == (CROP, CROP, 1)
    assert s["img1"].min() >= -1.0 and s["img1"].max() <= 1.0
    # density mass roughly tracks surviving point count (boundary losses ok)
    assert s["dmap"].sum() <= 30.5


def test_den_dataset_downsample_preserves_mass(synth_root):
    ds = DATASETS.build("den", root=synth_root, crop_size=CROP, downsample=4,
                        method="train", unit_size=16)
    rng = random.Random(3)
    s = ds.__getitem__(1, rng=rng)
    assert s["dmap"].shape == (CROP // 4, CROP // 4, 1)
    ds1 = DATASETS.build("den", root=synth_root, crop_size=CROP, downsample=1,
                         method="train", unit_size=16)
    s1 = ds1.__getitem__(1, rng=random.Random(3))
    # same rng stream → same geometric crop → same mass
    assert s["dmap"].sum() == pytest.approx(s1["dmap"].sum(), rel=1e-5)


def test_den_val_sample_padding(synth_root):
    ds = DATASETS.build("den", root=synth_root, crop_size=CROP, downsample=1,
                        method="val", unit_size=16)
    s = ds.__getitem__(0, rng=random.Random(0))
    h, w, _ = s["img1"].shape
    assert h % 16 == 0 and w % 16 == 0
    assert "name" in s and len(s["padding"]) == 4


def test_den_cls_two_views(synth_root):
    ds = DATASETS.build("den_cls", root=synth_root, crop_size=CROP, downsample=1,
                        method="train", is_grey=False, unit_size=16)
    s = ds.__getitem__(2, rng=random.Random(1))
    assert s["img1"].shape == s["img2"].shape == (CROP, CROP, 3)
    assert s["bmap"].shape == (CROP // 16, CROP // 16, 1)
    assert set(np.unique(s["bmap"])).issubset({0.0, 1.0})
    # both views share geometry: bmap consistent with dmap
    d = s["dmap"][..., 0]
    block = d.reshape(CROP // 16, 16, CROP // 16, 16).sum(axis=(1, 3))
    np.testing.assert_array_equal(s["bmap"][..., 0], (block > 0).astype(np.float32))


def test_bay_dataset(synth_root):
    ds = DATASETS.build("bay", root=synth_root, crop_size=CROP, downsample=1,
                        method="train", is_grey=False, unit_size=16)
    s = ds.__getitem__(0, rng=random.Random(5))
    assert s["img1"].shape == (CROP, CROP, 3)
    assert len(s["targets"]) == len(s["gt"])
    assert (s["targets"] >= 0.3).all() if len(s["targets"]) else True
    assert s["st_size"] >= CROP


def test_jhu_domain_dataset(synth_root):
    ds = DATASETS.build("jhu_domain", root=synth_root, domain_label="foo",
                        crop_size=CROP, downsample=1, method="train", unit_size=16)
    assert len(ds) == 6
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s["dmap"].shape == (CROP, CROP, 1)
    # test split falls back to val list
    ds_t = DATASETS.build("jhu_domain", root=synth_root, domain_label="foo",
                          crop_size=CROP, downsample=1, method="test", unit_size=16)
    assert len(ds_t) == 3


def test_loader_batching_and_determinism(synth_root):
    ds = DATASETS.build("den_cls", root=synth_root, crop_size=CROP, downsample=1,
                        method="train", is_grey=False, unit_size=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    dl.set_epoch(0)
    batches = list(dl)
    assert len(batches) == 1  # 6 samples, bs=4, drop_last
    b = batches[0]
    assert b["img1"].shape == (4, CROP, CROP, 3)
    assert b["points"].shape[0] == 4 and b["points"].shape[2] == 2
    assert b["pt_mask"].dtype == bool
    assert (b["gt_count"] == b["pt_mask"].sum(1)).all()

    # determinism: same seed+epoch → identical batch
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=3, seed=7)
    dl2.set_epoch(0)
    b2 = next(iter(dl2))
    np.testing.assert_array_equal(b["img1"], b2["img1"])
    np.testing.assert_array_equal(b["dmap"], b2["dmap"])

    # different epoch → different batch
    dl.set_epoch(1)
    b3 = next(iter(dl))
    assert not np.array_equal(b["img1"], b3["img1"])


def test_val_loader_returns_raw_samples(synth_root):
    ds = DATASETS.build("den_cls", root=synth_root, crop_size=CROP, downsample=1,
                        method="val", is_grey=False, unit_size=16)
    dl = DataLoader(ds, batch_size=1, shuffle=False)
    s = next(iter(dl))
    assert "name" in s and s["img1"].ndim == 3 and s["img2"].ndim == 3
