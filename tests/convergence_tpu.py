"""Real-TPU convergence check (manual, not in the pytest suite).

Builds a LEARNABLE synthetic dataset — head points drawn around bright
blobs actually rendered into the image, so density is predictable from
pixels — trains DGModel 'final' for a few epochs on the TPU through the
full trainer, and reports the val MAE trajectory. Run:

    python tests/convergence_tpu.py [--epochs 8] [--cpu]
"""

import argparse
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_learnable_dataset(root, n_train=32, n_val=8, hw=(128, 128), seed=0):
    from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np

    rng = np.random.default_rng(seed)
    h, w = hw
    for split, n in (("train", n_train), ("val", n_val), ("test", n_val)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for k in range(n):
            img = rng.uniform(0, 60, (h, w, 3))
            n_pts = int(rng.integers(5, 40))
            pts = rng.uniform(8, [w - 8, h - 8], (n_pts, 2)).astype(np.float32)
            # render a bright blob at every head point → count is learnable
            yy, xx = np.mgrid[0:h, 0:w]
            for x, y in pts:
                blob = 180 * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 3.0**2))
                img[..., 0] += blob
                img[..., 1] += 0.8 * blob
                img[..., 2] += 0.6 * blob
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                os.path.join(d, f"img{k:03d}.jpg"))
            np.save(os.path.join(d, f"img{k:03d}.npy"), pts)
            np.save(os.path.join(d, f"img{k:03d}_dmap.npy"),
                    gaussian_density_fixed_np((h, w), pts))


# per-mode experiment specs mirroring the shipped configs
# (configs/sta_final.yml, ablation/sta_cls.yml, baselines/sta_{isw,sw,ibn,bl}.yml)
MSE = {"name": "mse", "params": {}}
MODE_SPECS = {
    "final": dict(mode="final", ds="den_cls", loss=MSE, lr=5e-4,
                  model={"name": "final", "params": {
                      "pretrained": False, "mem_size": 256, "mem_dim": 128}}),
    "cls": dict(mode="cls", ds="den_cls", loss=MSE, lr=5e-4,
                model={"name": "cls", "params": {"pretrained": False}}),
    "isw": dict(mode="isw", ds="den_cls", loss=MSE, lr=1e-4,
                model={"name": "isw", "params": {
                    "pretrained": False, "relax_denom": 2.0, "clusters": 3}}),
    "sw": dict(mode="simple", ds="den", loss=MSE, lr=1e-4,
               model={"name": "sw", "params": {"pretrained": False}}),
    "ibn": dict(mode="simple", ds="den", loss=MSE, lr=1e-4,
                model={"name": "ibn", "params": {"pretrained": False}}),
    # log_para 1: the Bayesian loss trains raw count densities while
    # predict divides by log_para (basetrainer.py:37 vs :60-64).
    # batch_norm=True: the reference's plain-vgg19 BL only trains from
    # ImageNet init (BL.py loads pretrained unconditionally) — from
    # scratch, adam's sign-like first steps blow up the unnormalized
    # 16-conv stack and the loss's L1 pressure then collapses it to the
    # predict-zero minimum (verified empirically; ReLU-headed models die
    # outright, BL's |abs| head survives but stalls). The BN variant
    # trains from scratch with the full background row.
    "bay": dict(mode="simple", ds="bay", lr=5e-4, log_para=1,
                loss={"name": "bl", "params": {
                    "sigma": 8.0, "c_size": 128, "stride": 8,
                    "background_ratio": 0.15, "use_background": True}},
                model={"name": "bl", "params": {"pretrained": False,
                                                "batch_norm": True}}),
}


def run_mode(mode: str, root: str, epochs: int, lr=None):
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    spec = MODE_SPECS[mode]
    ds = {"name": spec["ds"], "params": {
        "root": root, "crop_size": 128, "downsample": 1,
        "is_grey": False, "unit_size": 16}}
    cfg = Config.from_dict({
        "seed": 7, "version": f"convergence_{mode}",
        "log_para": spec.get("log_para", 1000),
        "patch_size": 1440, "mode": spec["mode"], "num_epochs": epochs,
        "checkpoint": None,
        "model": spec["model"],
        "train_dataset": ds, "val_dataset": ds, "test_dataset": ds,
        "train_loader": {"batch_size": 8, "num_workers": 4, "shuffle": True},
        "val_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "test_loader": {"batch_size": 1, "num_workers": 0, "shuffle": False},
        "loss": spec["loss"],
        "optimizer": {"name": "adamw", "params": {
            "lr": lr or spec["lr"], "weight_decay": 1e-4}},
        "scheduler": {"name": "cosine", "params": {"T_max": epochs}},
        "compute_dtype": "bfloat16",
        "log_dir": os.path.join(root, "logs"),
    })
    t = DGTrainer(cfg)
    t.build()
    best, best_epoch = t.train()
    print(f"RESULT mode={mode} best_val_mae={best:.3f} at epoch {best_epoch}",
          flush=True)
    return best, best_epoch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--root", default=None)
    parser.add_argument("--mode", default="final",
                        choices=sorted(MODE_SPECS) + ["all"])
    parser.add_argument("--lr", type=float, default=None)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = args.root or tempfile.mkdtemp(prefix="conv_ds_")
    if not os.path.exists(os.path.join(root, "train")):
        print(f"building dataset at {root}", flush=True)
        make_learnable_dataset(root)

    modes = sorted(MODE_SPECS) if args.mode == "all" else [args.mode]
    for mode in modes:
        run_mode(mode, root, args.epochs, lr=args.lr)


if __name__ == "__main__":
    main()
