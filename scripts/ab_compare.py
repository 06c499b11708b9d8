#!/usr/bin/env python3
"""Cross-framework A/B: reference torch trainer vs dgvcc_tpu, lockstep.

The strongest quality comparison achievable without the real datasets
(none are reachable in this container): train the ACTUAL reference
torch model (imported from /root/reference via tests/reference_oracle
shims) and the dgvcc_tpu flax model

  * from IDENTICAL initial weights (torch init → nn/torch_io converter,
    itself eval-parity-tested in tests/test_eval_parity.py),
  * on IDENTICAL batches (both sides consume the same seeded dgvcc_tpu
    loader — data, augmentation, and order are equal by construction),
  * with the same loss (MSE on log_para-scaled density maps,
    trainers/basetrainer.py:30-37) and optimizer (Adam, same lr).

Per-epoch val MAE (predict-sum protocol, basetrainer.py:51-65) is then
directly comparable: remaining differences are framework numerics +
Adam implementation details only.

Note: the reference's own train_step forgets loss.backward()
(basetrainer.py:86-105 — documented in SURVEY.md); this harness runs
the corrected protocol on the torch side, as our trainer does.

Usage:  python scripts/ab_compare.py [--family mcnn] [--epochs 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

LOG_PARA = 1000.0


def build_data(root, seed=0):
    from convergence_tpu import make_learnable_dataset

    make_learnable_dataset(root, n_train=16, n_val=8, hw=(128, 128),
                           seed=seed)


def make_loader(root, downsample, seed):
    from dgvcc_tpu.core.registry import DATASETS
    from dgvcc_tpu.data.loader import DataLoader
    import dgvcc_tpu.data  # noqa: F401

    train = DATASETS.build("den", method="train", root=root, crop_size=128,
                           downsample=downsample, unit_size=16)
    val = DATASETS.build("den", method="val", root=root, crop_size=128,
                         downsample=downsample, unit_size=16)
    return (DataLoader(train, batch_size=8, shuffle=True, seed=seed),
            val)


def ab_run(family: str, epochs: int, lr: float, seed: int = 0,
           optimizer: str = "adam"):
    """optimizer='sgd' is the numerics-identity mode: with BN-deep
    graphs (dg_base), cross-implementation float noise (~1e-4 after 13
    train-mode BNs even on CPU) flips the SIGN of near-zero gradients,
    and Adam's first-step ±lr·sign(g) turns each flip into a full-size
    parameter divergence — per-epoch losses then differ ~5% while the
    trajectories still track (measured, BENCH_NOTES "dg_base A/B").
    SGD keeps updates proportional to the gradient, so losses agree to
    ~1e-4 relative and the harness itself is provably lockstep."""
    import numpy as np
    import torch
    import jax

    # Numerics-identity harness: keep f32 convs true-f32 on TPU. Under
    # the default precision TPU lowers f32 convs to bf16 passes; the
    # residue is invisible in eval (tiny un-normalized outputs) but
    # train-mode BN normalizes activations to O(1), turning it into
    # ~1e-1 prediction drift (measured: dg_base train-forward diff
    # 0.144 default vs 1.3e-4 on CPU / highest).
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax

    from reference_oracle import ref_import
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.core.registry import MODELS
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    build_kw = {}
    if family == "mcnn":
        ref = ref_import("models.baselines.MCNN").MCNN()
        downsample = 4
    elif family == "bl":
        ref = ref_import("models.baselines.BL").BL_VGG(pretrained=False)
        downsample = 8
    elif family == "dg_base":
        # the flagship DG family, dropout disabled so train-mode
        # forwards are deterministic (models.py:29-96) — train-mode BN
        # batch stats compute identically on both sides
        ref = ref_import("models.models").DGModel_base(
            pretrained=False, den_dropout=0.0)
        downsample = 1
        build_kw = {"den_dropout": 0.0, "pretrained": False}
    elif family == "ibn":
        # the whitening family's train-mode arm: resnet50_ibn_b counter
        # (ibnnet/__init__.py:11-28) — affine InstanceNorms (per-sample,
        # no running stats: train==eval) interleaved with train-mode
        # BatchNorms, the mix the migrated whitening counters rest on.
        # ref_import's hub shim satisfies the hard-coded pretrained load
        # with a fresh same-architecture state_dict.
        ref = ref_import("models.ibnnet").IBNCounter_ResNet()
        downsample = 1
        build_kw = {"pretrained": False}
    elif family == "sw":
        # SwitchWhiten counter (models/SW/__init__.py:24-42): train-mode
        # Newton–Schulz whitening with importance-weighted batch/instance
        # stats AND running-stat momentum updates — the most
        # TPU-idiosyncratic compute in the project, here checked through
        # training gradients against the actual reference module.
        ref = ref_import("models.SW").SWCounter_ResNet()
        downsample = 1
        build_kw = {"pretrained": False}
    else:
        raise SystemExit(
            f"unsupported family {family} (mcnn | bl | dg_base | ibn | sw)")
    torch.manual_seed(seed)

    root = tempfile.mkdtemp(prefix=f"ab_{family}_")
    build_data(root, seed)
    loader, val_ds = make_loader(root, downsample, seed)

    # identical initial weights via the tested converter. The .copy()
    # is load-bearing: .numpy() ALIASES torch parameter storage, and
    # contiguous 1-D leaves (biases, norm scales) convert to jax
    # zero-copy on CPU — without the copy, every torch optimizer step
    # silently mutates the "jax" weights too (caught by the IBN arm,
    # whose many affine-norm params made the contamination visible)
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    model = MODELS.build({"dg_base": "base"}.get(family, family), **build_kw)
    has_bn = family in ("dg_base", "ibn", "sw")
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    v = model.init(init_rngs, jnp.zeros((1, 64, 64, 3)), train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    params = v2["params"]
    bstats = v2.get("batch_stats", {})

    tx = optax.sgd(lr) if optimizer == "sgd" else optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, bstats, opt_state, img, dmap):
        def loss_fn(p):
            if has_bn:  # train-mode BN: batch stats, like torch .train()
                pred, nv = model.apply(
                    {"params": p, "batch_stats": bstats}, img, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                nbs = nv["batch_stats"]
            else:
                pred = model.apply({"params": p}, img, train=False)
                nbs = bstats
            return jnp.mean((pred - dmap * LOG_PARA) ** 2), nbs

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), nbs, opt_state2, loss

    @jax.jit
    def jpred(params, bstats, img):
        vv = {"params": params}
        if has_bn:
            vv["batch_stats"] = bstats
        return jnp.sum(model.apply(vv, img, train=False)) / LOG_PARA

    topt = (torch.optim.SGD(ref.parameters(), lr=lr) if optimizer == "sgd"
            else torch.optim.Adam(ref.parameters(), lr=lr))
    tloss = torch.nn.MSELoss()

    def torch_step(img_nhwc, dmap_nhwc):
        # ascontiguousarray: torch.tensor keeps numpy strides, and the
        # reference SW layer .view()s its input (switchwhiten.py:115) —
        # real loaders hand it contiguous NCHW, so must the harness
        x = torch.tensor(np.ascontiguousarray(
            np.transpose(img_nhwc, (0, 3, 1, 2))))
        y = torch.tensor(np.ascontiguousarray(
            np.transpose(dmap_nhwc, (0, 3, 1, 2))))
        topt.zero_grad()
        out = ref(x)
        lv = tloss(out, y * LOG_PARA)
        lv.backward()
        topt.step()
        return float(lv.detach())

    def val_mae():
        ref.eval()
        tm, jm = [], []
        for i in range(len(val_ds)):
            s = val_ds[i]
            gt = len(s["gt"])
            img = s["img1"][None]
            with torch.no_grad():
                tp = float(ref(torch.tensor(np.ascontiguousarray(
                    np.transpose(img, (0, 3, 1, 2))))).sum()) / LOG_PARA
            jp = float(jpred(params, bstats, jnp.asarray(img)))
            tm.append(abs(tp - gt))
            jm.append(abs(jp - gt))
        ref.train()
        return float(np.mean(tm)), float(np.mean(jm))

    print(f"A/B {family}: {epochs} epochs, lr={lr}, identical init + "
          f"batches, corrected reference protocol")
    print(f"{'epoch':>5} {'torch loss':>11} {'tpu loss':>11} "
          f"{'torch MAE':>10} {'tpu MAE':>10}")
    rows = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        tl = jl = 0.0
        nb = 0
        for batch in loader:
            img = np.asarray(batch["img1"], np.float32)
            dmap = np.asarray(batch["dmap"], np.float32)
            tl += torch_step(img, dmap)
            params, bstats, opt_state, l2 = jstep(params, bstats, opt_state,
                                                  jnp.asarray(img),
                                                  jnp.asarray(dmap))
            jl += float(l2)
            nb += 1
        tmae, jmae = val_mae()
        rows.append((epoch, tl / nb, jl / nb, tmae, jmae))
        print(f"{epoch:5d} {tl / nb:11.4f} {jl / nb:11.4f} "
              f"{tmae:10.3f} {jmae:10.3f}", flush=True)
    t_final = np.mean([r[3] for r in rows[-3:]])
    j_final = np.mean([r[4] for r in rows[-3:]])
    print(f"\nfinal-3-epoch mean val MAE: torch {t_final:.3f} | "
          f"dgvcc_tpu {j_final:.3f}")
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="mcnn",
                    choices=["mcnn", "bl", "dg_base", "ibn", "sw"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    a = ap.parse_args()
    ab_run(a.family, a.epochs, a.lr, a.seed, a.optimizer)
