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


def run_mode(mode: str, root: str, epochs: int, lr=None,
             model_params=None):
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    spec = MODE_SPECS[mode]
    if model_params:
        spec = dict(spec, model={
            "name": spec["model"]["name"],
            "params": {**spec["model"]["params"], **model_params}})
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


def quant_eval(root: str, epochs: int, lr=None):
    """Train mode 'final', then eval the val split through BOTH the fp
    eval forward and the int8 PTQ graph (nn/quant.py) — the accuracy
    evidence for quantized serving on a TRAINED model."""
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.nn.quant import QuantizedDG
    from dgvcc_tpu.train.trainer import DGTrainer

    spec = MODE_SPECS["final"]
    ds = {"name": spec["ds"], "params": {
        "root": root, "crop_size": 128, "downsample": 1,
        "is_grey": False, "unit_size": 16}}
    cfg = Config.from_dict({
        "seed": 7, "version": "convergence_quant",
        "log_para": 1000, "patch_size": 1440, "mode": "final",
        "num_epochs": epochs, "checkpoint": None, "model": spec["model"],
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
    t.train()

    variables = {"params": unfreeze(t.state.params),
                 "batch_stats": unfreeze(t.state.batch_stats)}

    def load_split(split):
        d = os.path.join(root, split)
        for n in sorted(os.listdir(d)):
            if not n.endswith(".jpg"):
                continue
            img = np.asarray(Image.open(os.path.join(d, n)), np.float32)
            x = (img / 255.0 - 0.5) / 0.5
            pts = np.load(os.path.join(d, n[:-4] + ".npy"))
            yield x[None], len(pts)

    calib = jnp.asarray(np.concatenate(
        [x for x, _ in list(load_split("train"))[:4]]))
    q = QuantizedDG.from_model(t.model, variables, calib)

    @jax.jit
    def fp_count(variables, x):
        d, _ = t.model.apply(variables, x)
        return jnp.sum(d.astype(jnp.float32)) / cfg.log_para

    errs_fp, errs_q, gaps = [], [], []
    for x, gt in load_split("val"):
        xj = jnp.asarray(x, jnp.bfloat16)
        c_fp = float(fp_count(variables, xj))
        d8, _ = q(xj)
        c_q = float(jnp.sum(d8.astype(jnp.float32)) / cfg.log_para)
        errs_fp.append(abs(c_fp - gt))
        errs_q.append(abs(c_q - gt))
        gaps.append(abs(c_fp - c_q) / max(abs(c_fp), 1e-6))
    print(f"RESULT quant_eval fp_mae={np.mean(errs_fp):.3f} "
          f"int8_mae={np.mean(errs_q):.3f} "
          f"mean|fp-int8|/fp={np.mean(gaps):.4f} max={np.max(gaps):.4f}",
          flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--root", default=None)
    parser.add_argument("--mode", default="final",
                        choices=sorted(MODE_SPECS) + ["all"])
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--quant-eval", action="store_true",
                        help="after training mode 'final', compare fp vs "
                             "int8 PTQ eval MAE on the val split")
    parser.add_argument("--batched-two-view", action="store_true",
                        help="mode 'final' with batched_two_view=True "
                             "(union-BN two-view fusion) — for the "
                             "on/off convergence A/B")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = args.root or tempfile.mkdtemp(prefix="conv_ds_")
    if not os.path.exists(os.path.join(root, "train")):
        print(f"building dataset at {root}", flush=True)
        make_learnable_dataset(root)

    if args.quant_eval:
        quant_eval(root, args.epochs, lr=args.lr)
        return

    modes = sorted(MODE_SPECS) if args.mode == "all" else [args.mode]
    mp = {"batched_two_view": True} if args.batched_two_view else None
    for mode in modes:
        run_mode(mode, root, args.epochs, lr=args.lr, model_params=mp)


if __name__ == "__main__":
    main()
