"""Offline dataset preprocessing: raw releases → canonical layout.

Canonical layout (consumed by dgvcc_tpu.data.datasets):
    {data_dir}/{train,val,test}/NAME.jpg + NAME.npy  (points, (N,2) xy)

Re-creation of /root/reference/utils/preprocess_data.py (11 datasets).
Per-dataset annotation extraction and the split rules are preserved:

    jhu        — txt gt per image, {train,val,test} dirs (ref :43-64,200-213)
    qnrf       — .mat annPoints; Train→{train,val} via list file, Test→test
    smartcity  — .mat 'loc'; random 60/20/20 split (ref :247-268)
    sta/stb    — GT_*.mat image_info; train_data→{train,val}, test_data→test
                 (the reference's run_sta is a one-off hack that only emits
                 'val' and skips existing files, ref :269-309 — here the
                 clean 80/20 seeded split is implemented)
    cc50       — .mat annPoints; random 60/20/20 (ref :310-330)
    fdst       — video frames; fixed train-video list, others→val (ref :331-381)
    vidcrowd   — val videos 10/12/13/16 (ref :383-419); no resize (ref :138-145)
    worldexpo  — mat 'annotation'; no resize (ref :167-174)
    nwpu       — id ranges: ≤3109 train, ≤3609 val, rest test (ref :421-443)
    mall       — mall_gt.mat frames; 600/200/1200 split (ref :445-470)
    ucsd       — vidf scenes 003-006 trainval (180 frame split), rest test
                 (ref :472-505); 'ucsd2' variant: 003-005 train, 006 val

All images are resized so min(h,w) ∈ [min_size, max_size] with points
scaled by the same ratio (cal_new_size, ref :11-34); out-of-bounds
points are clamped out before resizing. PIL BICUBIC replaces cv2
INTER_CUBIC (no cv2 in this environment).
"""

from __future__ import annotations

import argparse
import os
import random
from glob import glob

import numpy as np
from PIL import Image


def cal_new_size(im_h, im_w, min_size, max_size):
    """Resize rule (reference utils/preprocess_data.py:11-34)."""
    if im_h < im_w:
        if im_h < min_size:
            ratio = 1.0 * min_size / im_h
            im_h, im_w = min_size, round(im_w * ratio)
        elif im_h > max_size:
            ratio = 1.0 * max_size / im_h
            im_h, im_w = max_size, round(im_w * ratio)
        else:
            ratio = 1.0
    else:
        if im_w < min_size:
            ratio = 1.0 * min_size / im_w
            im_w, im_h = min_size, round(im_h * ratio)
        elif im_w > max_size:
            ratio = 1.0 * max_size / im_w
            im_w, im_h = max_size, round(im_h * ratio)
        else:
            ratio = 1.0
    return im_h, im_w, ratio


def find_dis(points):
    """Mean 3-NN distance per point (reference :37-41), guarded for
    sparse images (<4 points) like BayesianDataset._cal_dists."""
    points = np.asarray(points, np.float64).reshape(-1, 2)
    if len(points) == 0:
        return np.zeros((0, 1))
    if len(points) == 1:
        return np.array([[4.0]])
    sq = np.sum(points * points, axis=1)
    dis = np.sqrt(np.maximum(sq[:, None] - 2 * points @ points.T + sq[None, :], 0.0))
    if len(points) < 4:
        return np.mean(dis[:, 1:], axis=1, keepdims=True)
    return np.mean(np.partition(dis, 3, axis=1)[:, 1:4], axis=1, keepdims=True)


def _clamp_points(points, im_w, im_h):
    points = np.asarray(points, np.float32).reshape(-1, 2)
    if len(points) == 0:
        return points
    keep = ((points[:, 0] >= 0) & (points[:, 0] <= im_w)
            & (points[:, 1] >= 0) & (points[:, 1] <= im_h))
    return points[keep]


def _resize(im: Image.Image, points, min_size, max_size):
    im_w, im_h = im.size
    points = _clamp_points(points, im_w, im_h)
    new_h, new_w, ratio = cal_new_size(im_h, im_w, min_size, max_size)
    if ratio != 1.0:
        im = im.resize((new_w, new_h), Image.BICUBIC)
        points = points * ratio
    return im, points


# ---- annotation extractors -------------------------------------------------

def _load_mat(path, key):
    from scipy.io import loadmat

    return loadmat(path)[key].astype(np.float32)


def points_jhu(im_path):
    txt = im_path.replace("images", "gt").replace(".jpg", ".txt")
    pts = []
    with open(txt) as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) >= 2:
                pts.append([float(parts[0]), float(parts[1])])
    return np.asarray(pts, np.float32).reshape(-1, 2)


def points_qnrf(im_path):
    return _load_mat(im_path.replace(".jpg", "_ann.mat"), "annPoints")


def points_smartcity(im_path):
    return _load_mat(im_path.replace(".jpg", ".mat"), "loc")


def points_sta(im_path):
    from scipy.io import loadmat

    name = os.path.basename(im_path).rsplit(".", 1)[0]
    mat = os.path.abspath(os.path.join(im_path, os.pardir, os.pardir,
                                       "ground-truth", f"GT_{name}.mat"))
    return loadmat(mat)["image_info"][0][0][0][0][0].astype(np.float32)


def points_fdst(im_path):
    name = os.path.basename(im_path).rsplit(".", 1)[0]
    mat = os.path.abspath(os.path.join(im_path, os.pardir, os.pardir,
                                       "annotation", f"{name}.mat"))
    return _load_mat(mat, "annotation")


def points_nwpu(im_path):
    name = os.path.basename(im_path).rsplit(".", 1)[0]
    mat = os.path.abspath(os.path.join(im_path, os.pardir, os.pardir,
                                       "mats", f"{name}.mat"))
    if not os.path.exists(mat):
        return None
    return _load_mat(mat, "annPoints")


# ---- emit helpers -----------------------------------------------------------

def _emit(im, points, save_dir, name, quality=95):
    os.makedirs(save_dir, exist_ok=True)
    im_path = os.path.join(save_dir, name)
    im.save(im_path, quality=quality)
    stem, _ = os.path.splitext(im_path)
    np.save(stem + ".npy", points)


def _convert_list(im_list, point_fn, save_dir, min_size, max_size, resize=True):
    for im_path in im_list:
        im = Image.open(im_path).convert("RGB")
        points = point_fn(im_path)
        if points is None:
            points = np.zeros((0, 2), np.float32)
            save_pts = False
        else:
            save_pts = True
        if resize:
            im, points = _resize(im, points, min_size, max_size)
        else:
            points = _clamp_points(points, *im.size)
        name = os.path.basename(im_path)
        if save_pts:
            _emit(im, points, save_dir, name)
        else:  # nwpu unlabeled test images: image only (ref :440-443)
            os.makedirs(save_dir, exist_ok=True)
            im.save(os.path.join(save_dir, name), quality=95)


def _random_split_602020(im_list, seed):
    im_list = list(im_list)
    random.Random(seed).shuffle(im_list)
    a = int(len(im_list) * 0.6)
    b = int(len(im_list) * 0.8)
    return {"train": im_list[:a], "val": im_list[a:b], "test": im_list[b:]}


# ---- per-dataset runners ----------------------------------------------------

def run_jhu(origin_dir, save_dir, min_size, max_size, seed=0):
    for phase in ("train", "val", "test"):
        ims = glob(os.path.join(origin_dir, phase, "images", "*jpg"))
        _convert_list(ims, points_jhu, os.path.join(save_dir, phase),
                      min_size, max_size)


def run_qnrf(origin_dir, save_dir, min_size, max_size, seed=0, split_file=None):
    train_ims = sorted(glob(os.path.join(origin_dir, "Train", "*jpg")))
    if split_file:
        # split_file lists the VAL image names (the reference consumes
        # explicit ucf_{train,val}.txt lists, preprocess_data.py:224)
        val_names = set(open(split_file).read().split())
        n_match = sum(os.path.basename(p) in val_names for p in train_ims)
        if n_match > len(train_ims) // 2:
            raise SystemExit(
                f"--split-file matches {n_match}/{len(train_ims)} training "
                "images — this looks like the TRAIN list; pass the VAL list "
                "(e.g. ucf_val.txt), not ucf_train.txt")
        splits = {"train": [p for p in train_ims if os.path.basename(p) not in val_names],
                  "val": [p for p in train_ims if os.path.basename(p) in val_names]}
    else:
        rnd = list(train_ims)
        random.Random(seed).shuffle(rnd)
        cut = int(len(rnd) * 0.9)
        splits = {"train": rnd[:cut], "val": rnd[cut:]}
    splits["test"] = glob(os.path.join(origin_dir, "Test", "*jpg"))
    for phase, ims in splits.items():
        _convert_list(ims, points_qnrf, os.path.join(save_dir, phase),
                      min_size, max_size)


def run_smartcity(origin_dir, save_dir, min_size, max_size, seed=0):
    ims = glob(os.path.join(origin_dir, "images", "*jpg"))
    for phase, lst in _random_split_602020(ims, seed).items():
        _convert_list(lst, points_smartcity, os.path.join(save_dir, phase),
                      min_size, max_size)


def run_sta(origin_dir, save_dir, min_size, max_size, seed=0):
    """ShanghaiTech part A/B: train_data → train/val (80/20 seeded),
    test_data → test."""
    train_ims = sorted(glob(os.path.join(origin_dir, "train_data", "images", "*jpg")))
    rnd = list(train_ims)
    random.Random(seed).shuffle(rnd)
    cut = int(len(rnd) * 0.8)
    splits = {"train": rnd[:cut], "val": rnd[cut:],
              "test": glob(os.path.join(origin_dir, "test_data", "images", "*jpg"))}
    for phase, ims in splits.items():
        _convert_list(ims, points_sta, os.path.join(save_dir, phase),
                      min_size, max_size)


def run_cc50(origin_dir, save_dir, min_size, max_size, seed=0):
    ims = glob(os.path.join(origin_dir, "*jpg"))
    for phase, lst in _random_split_602020(ims, seed).items():
        _convert_list(lst, points_qnrf, os.path.join(save_dir, phase),
                      min_size, max_size)


FDST_TRAIN_VIDEOS = {1, 2, 6, 7, 11, 12, 16, 17, 21, 22, 26, 27, 31, 32, 36, 37,
                     41, 42, 46, 47, 51, 52, 56, 57, 61, 62, 66, 67, 71, 72, 76,
                     77, 81, 82, 86, 87, 91, 92, 96, 97}


def run_fdst(origin_dir, save_dir, min_size, max_size, seed=0):
    train_ims = glob(os.path.join(origin_dir, "train", "img", "*jpg"))
    for im_path in train_ims:
        vid = int(os.path.basename(im_path).split("_")[0])
        phase = "train" if vid in FDST_TRAIN_VIDEOS else "val"
        _convert_list([im_path], points_fdst, os.path.join(save_dir, phase),
                      min_size, max_size)
    test_ims = glob(os.path.join(origin_dir, "test", "img", "*jpg"))
    _convert_list(test_ims, points_fdst, os.path.join(save_dir, "test"),
                  min_size, max_size)


VIDCROWD_VAL_VIDEOS = ("10", "12", "13", "16")


def run_vidcrowd(origin_dir, save_dir, min_size, max_size, seed=0):
    for phase_raw, phase_out in (("train", None), ("test", "test")):
        ann_dir = os.path.join(origin_dir, f"VidCrowd_{phase_raw}_ann_newsplit")
        gts = glob(os.path.join(ann_dir, "*.mat"))
        if phase_raw == "train":
            val_gts = []
            for v in VIDCROWD_VAL_VIDEOS:
                val_gts += glob(os.path.join(ann_dir, v + "_*.mat"))
            split = {"train": sorted(set(gts) - set(val_gts)), "val": val_gts}
        else:
            split = {"test": gts}
        for phase, gt_list in split.items():
            for gt_path in gt_list:
                name = os.path.basename(gt_path).replace("mat", "jpg")
                im = Image.open(os.path.join(origin_dir, "images", name)).convert("RGB")
                points = _clamp_points(_load_mat(gt_path, "annotation"), *im.size)
                _emit(im, points, os.path.join(save_dir, phase), name)


def run_worldexpo(origin_dir, save_dir, min_size, max_size, seed=0):
    for phase in ("train", "val", "test"):
        ann_dir = os.path.join(origin_dir, phase, "annotation")
        for gt_path in glob(os.path.join(ann_dir, "*.mat")):
            name = os.path.basename(gt_path).replace("mat", "jpg")
            im = Image.open(os.path.join(origin_dir, phase, "images", name)).convert("RGB")
            points = _clamp_points(_load_mat(gt_path, "annotation"), *im.size)
            _emit(im, points, os.path.join(save_dir, phase), name)


def run_nwpu(origin_dir, save_dir, min_size, max_size, seed=0):
    for img_fn in glob(os.path.join(origin_dir, "images", "*.jpg")):
        idx = int(os.path.basename(img_fn).split(".")[0])
        phase = "train" if idx <= 3109 else ("val" if idx <= 3609 else "test")
        _convert_list([img_fn], points_nwpu, os.path.join(save_dir, phase),
                      min_size, max_size)


def _unwrap_points(cell) -> np.ndarray:
    """Drill through loadmat's nested object/struct wrappers until an
    (N, 2+) numeric array appears (mall 'frame' cells, ucsd 'fgt')."""
    arr = cell
    for _ in range(8):
        if isinstance(arr, np.ndarray) and arr.dtype != object and arr.ndim == 2 \
                and arr.shape[1] >= 2 and not arr.dtype.names:
            return arr.astype(np.float32)
        if isinstance(arr, np.ndarray) and arr.dtype.names:  # struct: first field
            arr = arr[arr.dtype.names[0]]
            continue
        if isinstance(arr, np.ndarray) and arr.size >= 1:
            arr = arr.reshape(-1)[0]
            continue
        break
    raise ValueError(f"cannot unwrap point array from {type(cell)}")


def run_mall(origin_dir, save_dir, min_size, max_size, seed=0):
    from scipy.io import loadmat

    ims = sorted(glob(os.path.join(origin_dir, "frames", "*jpg")))
    pts_list = loadmat(os.path.join(origin_dir, "mall_gt.mat"))["frame"][0]
    splits = {"train": (0, 600), "val": (600, 800), "test": (800, len(ims))}
    for phase, (lo, hi) in splits.items():
        for idx in range(lo, min(hi, len(ims))):
            im = Image.open(ims[idx]).convert("RGB")
            pts = _unwrap_points(pts_list[idx])[:, :2]
            pts = _clamp_points(pts, *im.size)
            im, pts = _resize(im, pts, min_size, max_size)
            _emit(im, pts, os.path.join(save_dir, phase), os.path.basename(ims[idx]))


def _run_ucsd_scenes(origin_dir, save_dir, scene_to_phase, min_size, max_size,
                     frame_split=None):
    from scipy.io import loadmat

    for scene, phase in scene_to_phase.items():
        vdir = os.path.join(origin_dir, "video", "vidf", f"vidf1_33_{scene}.y")
        ims = sorted(glob(os.path.join(vdir, "*png")))
        gt = os.path.join(origin_dir, "gt", "vidf", f"vidf1_33_{scene}_frame_full.mat")
        pts_list = loadmat(gt)["fgt"][0][0][0][0]
        for idx, im_path in enumerate(ims):
            p = phase
            if frame_split and phase == "trainval":
                p = "train" if idx < 180 else "val"
            im = Image.open(im_path).convert("RGB")
            pts = _unwrap_points(pts_list[idx])[:, :2]
            pts = _clamp_points(pts, *im.size)
            im, pts = _resize(im, pts, min_size, max_size)
            _emit(im, pts, os.path.join(save_dir, p), os.path.basename(im_path))


def run_ucsd(origin_dir, save_dir, min_size, max_size, seed=0):
    mapping = {s: "trainval" for s in ("003", "004", "005", "006")}
    mapping.update({s: "test" for s in ("000", "001", "002", "007", "008", "009")})
    _run_ucsd_scenes(origin_dir, save_dir, mapping, min_size, max_size,
                     frame_split=True)


def run_ucsd2(origin_dir, save_dir, min_size, max_size, seed=0):
    mapping = {"003": "train", "004": "train", "005": "train", "006": "val"}
    mapping.update({s: "test" for s in ("000", "001", "002", "007", "008", "009")})
    _run_ucsd_scenes(origin_dir, save_dir, mapping, min_size, max_size)


RUNNERS = {
    "jhu": run_jhu, "qnrf": run_qnrf, "smartcity": run_smartcity,
    "sta": run_sta, "stb": run_sta, "cc50": run_cc50, "fdst": run_fdst,
    "vidcrowd": run_vidcrowd, "worldexpo": run_worldexpo, "nwpu": run_nwpu,
    "mall": run_mall, "ucsd": run_ucsd, "ucsd2": run_ucsd2,
}


def main():
    parser = argparse.ArgumentParser(description="raw dataset → canonical layout")
    parser.add_argument("--origin-dir", required=True)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--min-size", type=int, default=512)
    parser.add_argument("--max-size", type=int, default=2048)
    parser.add_argument("--dataset", required=True, choices=sorted(RUNNERS))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    RUNNERS[args.dataset](args.origin_dir, args.data_dir,
                          args.min_size, args.max_size, seed=args.seed)


if __name__ == "__main__":
    main()
