"""Offline density-map generation CLI.

Reference: /root/reference/utils/dmap_gen.py — per image, splat a
sigma=4 truncate=7/sigma Gaussian per head point, save
``{name}_dmap.npy`` next to the image. The reference loops per point in
scipy with a Pool(8) (dmap_gen.py:116-117) and, oddly, only processes
the 'test' phase (dmap_gen.py:107).

Here the splat is the separable-matmul kernel (dgvcc_tpu.ops.dmap):
one MXU matmul per image on TPU (--backend jax/pallas), or the numpy
golden implementation with a process pool (--backend numpy, default —
no accelerator needed and exact scipy parity). All phases are processed
by default.
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from multiprocessing import Pool

import numpy as np

from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np


def _out_path(img_fn: str) -> str:
    stem, _ = os.path.splitext(img_fn)
    return stem + "_dmap.npy"


def _process_numpy(img_fn: str, sigma: float = 4.0, overwrite: bool = False):
    out = _out_path(img_fn)
    if os.path.exists(out) and not overwrite:
        return
    from PIL import Image

    with Image.open(img_fn) as im:
        w, h = im.size
    stem, _ = os.path.splitext(img_fn)
    points = np.load(stem + ".npy")
    dmap = gaussian_density_fixed_np((h, w), points, sigma=sigma)
    np.save(out, dmap)


def _process_jax(img_fns, sigma: float, overwrite: bool, backend: str):
    import jax.numpy as jnp
    from PIL import Image

    from dgvcc_tpu.ops.dmap import gaussian_density_jax, gaussian_density_pallas

    fn = gaussian_density_pallas if backend == "pallas" else gaussian_density_jax
    for img_fn in img_fns:
        out = _out_path(img_fn)
        if os.path.exists(out) and not overwrite:
            continue
        with Image.open(img_fn) as im:
            w, h = im.size
        stem, _ = os.path.splitext(img_fn)
        points = np.load(stem + ".npy").astype(np.float32).reshape(-1, 2)
        # pad point count and image size to buckets to bound recompiles
        n = max(64, int(np.ceil(max(len(points), 1) / 256)) * 256)
        pts = np.zeros((n, 2), np.float32)
        msk = np.zeros((n,), bool)
        pts[: len(points)] = points
        msk[: len(points)] = True
        dmap = np.asarray(fn(jnp.asarray(pts), jnp.asarray(msk), h, w,
                             sigma=float(sigma)))
        np.save(out, dmap.astype(np.float32))


def main():
    parser = argparse.ArgumentParser(description="generate *_dmap.npy density maps")
    parser.add_argument("--path", required=True, help="canonical dataset root")
    parser.add_argument("--phases", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--sigma", type=float, default=4.0)
    parser.add_argument("--backend", choices=["numpy", "native", "jax", "pallas"],
                        default="native")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()

    if not os.path.exists(args.path):
        raise SystemExit(f"Path does not exist: {args.path}")

    img_fns = []
    for phase in args.phases:
        img_fns += glob(os.path.join(args.path, phase, "*.jpg"))
        img_fns += glob(os.path.join(args.path, phase, "*.png"))
    img_fns = [fn for fn in img_fns if "aug" not in os.path.basename(fn)]
    print(f"{len(img_fns)} images")

    if args.backend == "numpy":
        worker_args = [(fn, args.sigma, args.overwrite) for fn in img_fns]
        with Pool(args.workers) as p:
            p.starmap(_process_numpy, worker_args)
    elif args.backend == "native":
        from PIL import Image

        from dgvcc_tpu.data.native import gaussian_density_fixed_native

        for img_fn in img_fns:
            out = _out_path(img_fn)
            if os.path.exists(out) and not args.overwrite:
                continue
            with Image.open(img_fn) as im:
                w, h = im.size
            stem, _ = os.path.splitext(img_fn)
            points = np.load(stem + ".npy")
            np.save(out, gaussian_density_fixed_native((h, w), points,
                                                       sigma=args.sigma))
    else:
        _process_jax(img_fns, args.sigma, args.overwrite, args.backend)


if __name__ == "__main__":
    main()
