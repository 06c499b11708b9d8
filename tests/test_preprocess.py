"""Offline preprocessing tools: converters + dmap CLI end-to-end."""

import os
import sys
from glob import glob

import numpy as np
import pytest
from PIL import Image

from dgvcc_tpu.data.preprocess import (
    cal_new_size,
    find_dis,
    run_jhu,
    run_nwpu,
    run_mall,
)


def test_cal_new_size_rules():
    # too small → scale up to min
    h, w, r = cal_new_size(256, 400, 512, 2048)
    assert h == 512 and w == 800 and r == 2.0
    # too big → scale down to max
    h, w, r = cal_new_size(4096, 3000, 512, 2048)
    assert w == 2048 and r == pytest.approx(2048 / 3000)
    # in range → untouched
    assert cal_new_size(800, 600, 512, 2048) == (800, 600, 1.0)


def test_find_dis():
    pts = np.array([[0.0, 0], [1, 0], [2, 0], [3, 0], [10, 0]])
    d = find_dis(pts)
    assert d.shape == (5, 1)
    assert d[0, 0] == pytest.approx((1 + 2 + 3) / 3)


@pytest.fixture
def jhu_raw(tmp_path):
    rng = np.random.default_rng(0)
    for phase in ("train", "val", "test"):
        imd = tmp_path / "raw" / phase / "images"
        gtd = tmp_path / "raw" / phase / "gt"
        imd.mkdir(parents=True)
        gtd.mkdir(parents=True)
        for k in range(2):
            h, w = 300, 400  # below min_size → will be scaled up
            Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
                imd / f"{k:04d}.jpg")
            pts = rng.uniform(0, [w, h], (7, 2))
            lines = [f"{x:.1f} {y:.1f} 1 1 1\n" for x, y in pts]
            (gtd / f"{k:04d}.txt").write_text("".join(lines))
    return str(tmp_path / "raw"), str(tmp_path / "out")


def test_run_jhu_layout_and_scaling(jhu_raw):
    origin, out = jhu_raw
    run_jhu(origin, out, min_size=512, max_size=2048)
    for phase in ("train", "val", "test"):
        jpgs = sorted(glob(os.path.join(out, phase, "*.jpg")))
        npys = sorted(glob(os.path.join(out, phase, "*.npy")))
        assert len(jpgs) == 2 and len(npys) == 2
        im = Image.open(jpgs[0])
        assert min(im.size) >= 512  # resized into range
        pts = np.load(npys[0])
        assert pts.shape[1] == 2
        # points scaled with the image: all inside
        assert (pts[:, 0] <= im.size[0]).all() and (pts[:, 1] <= im.size[1]).all()


def test_run_mall_split(tmp_path):
    # 10-frame mini mall with the split boundaries scaled implicitly:
    # frames 0..599 train etc. — with 10 frames all land in 'train'
    from scipy.io import savemat

    rng = np.random.default_rng(1)
    frames = tmp_path / "mall" / "frames"
    frames.mkdir(parents=True)
    pts_cells = np.zeros((10,), object)
    for k in range(10):
        Image.fromarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)).save(
            frames / f"seq_{k:06d}.jpg")
        inner = np.zeros((1, 1), object)
        loc = np.zeros((1,), object)
        loc[0] = rng.uniform(0, [640, 480], (5, 2)).astype(np.float32)
        inner[0, 0] = loc
        pts_cells[k] = inner
    savemat(tmp_path / "mall" / "mall_gt.mat", {"frame": pts_cells.reshape(1, -1)})
    run_mall(str(tmp_path / "mall"), str(tmp_path / "mall_out"), 512, 2048)
    assert len(glob(str(tmp_path / "mall_out" / "train" / "*.jpg"))) == 10


def test_dmap_cli_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    d = tmp_path / "ds" / "train"
    d.mkdir(parents=True)
    for k in range(3):
        h, w = 64, 80
        Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
            d / f"img{k}.jpg")
        np.save(d / f"img{k}.npy", rng.uniform(0, [w, h], (6, 2)).astype(np.float32))

    from dgvcc_tpu.data import dmap_cli

    monkeypatch.setattr(sys, "argv", [
        "dmap_cli", "--path", str(tmp_path / "ds"), "--phases", "train",
        "--workers", "2",
    ])
    dmap_cli.main()
    dmaps = sorted(glob(str(d / "*_dmap.npy")))
    assert len(dmaps) == 3
    dm = np.load(dmaps[0])
    assert dm.shape == (64, 80)
    assert 0 < dm.sum() <= 6.0


def test_native_splat_matches_numpy_golden():
    """C++ splat library vs the numpy/scipy golden, fixed + adaptive."""
    from dgvcc_tpu.data.native import (
        gaussian_density_fixed_native,
        gaussian_density_adaptive_native,
    )
    from dgvcc_tpu.ops.dmap import (
        gaussian_density_fixed_np,
        gaussian_density_adaptive_np,
    )

    rng = np.random.default_rng(9)
    shape = (240, 320)
    pts = rng.uniform(0, [320, 240], (120, 2)).astype(np.float32)

    ours = gaussian_density_fixed_native(shape, pts, sigma=4.0, n_threads=4)
    golden = gaussian_density_fixed_np(shape, pts, sigma=4.0)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)

    ours_a = gaussian_density_adaptive_native(shape, pts, n_threads=4)
    golden_a = gaussian_density_adaptive_np(shape, pts)
    np.testing.assert_allclose(ours_a, golden_a, rtol=1e-3, atol=1e-5)


def test_native_splat_speed():
    """Native splat must beat the numpy golden comfortably on a big frame."""
    import time
    from dgvcc_tpu.data.native import gaussian_density_fixed_native
    from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np

    rng = np.random.default_rng(10)
    shape = (1024, 1024)
    pts = rng.uniform(0, 1024, (2000, 2)).astype(np.float32)
    gaussian_density_fixed_native(shape, pts)  # warm (build + threads)
    t0 = time.perf_counter()
    gaussian_density_fixed_native(shape, pts)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    gaussian_density_fixed_np(shape, pts)
    t_np = time.perf_counter() - t0
    assert t_native < t_np  # typically 10-100x faster
