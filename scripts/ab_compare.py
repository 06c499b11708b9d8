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

# CCTrans geometry mirroring tests/test_eval_parity.py: the Regression
# head hard-codes 256/512/1024 stage widths (CCTrans.py:16-38), stage 1
# and the depths stay tiny for CPU speed; depths=2 per stage exercises
# both the windowed and the global-subsampled attention paths.
_CC = dict(embed_dims=(32, 256, 512, 1024), num_heads=(2, 8, 16, 32),
           depths=(2, 2, 2, 2), wss=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1))


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

    # seed BEFORE reference construction: torch's default generator is
    # nondeterministically seeded per process, and ref init draws from
    # it — seeding afterwards made runs irreproducible across processes
    torch.manual_seed(seed)

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
    elif family == "sw_vgg":
        # the SW zoo's VGG19 counter (SW/__init__.py:12-22): SW layers
        # after every conv instead of interleaved with BN bottlenecks
        ref = ref_import("models.SW").SWCounter_VGG()
        downsample = 1
        build_kw = {"pretrained": False}
    elif family == "csrnet":
        ref = ref_import("models.baselines.CSRNet").CSRNet(
            load_weights=False)
        downsample = 8
    elif family == "dssinet":
        # CRFVGG (DSSINet.py:285-417): multi-scale pyramid with CRF
        # message passing and shared PReLUs — BN-free, so train-mode
        # forwards are deterministic
        ref = ref_import("models.baselines.DSSINet").CRFVGG()
        downsample = 1
    elif family == "sasnet":
        # SASNet (SASNet.py:47-214): VGG16-BN U-Net, per-scale density
        # heads + block confidence soft-selection, train-mode BN
        ref = ref_import("models.baselines.SASNet").SASNet(pretrained=False)
        downsample = 1
    elif family == "cctrans":
        # Twins-ALTGVT pyramid ViT (CCTrans.py:219-534) at the reduced
        # geometry the eval-parity test uses (Regression head hard-codes
        # 256/512/1024 stage widths; tiny depths for CPU speed). All
        # reference drop rates default 0, so train mode is deterministic
        # modulo the Regression head's BatchNorms.
        from functools import partial
        CC = ref_import("models.baselines.CCTrans")
        ref = CC.ALTGVT(
            patch_size=4, embed_dims=list(_CC["embed_dims"]),
            num_heads=list(_CC["num_heads"]), mlp_ratios=[4, 4, 4, 4],
            qkv_bias=True, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            depths=list(_CC["depths"]), wss=list(_CC["wss"]),
            sr_ratios=list(_CC["sr_ratios"]))
        downsample = 8
        build_kw = dict(_CC)
    else:
        raise SystemExit(
            f"unsupported family {family} (mcnn | bl | dg_base | ibn | sw "
            f"| sw_vgg | csrnet | dssinet | sasnet | cctrans)")

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
    # families whose train-mode forward differs from eval: BatchNorm
    # batch stats and/or whitening running-stat momentum updates
    has_bn = family in ("dg_base", "ibn", "sw", "sw_vgg", "sasnet",
                        "cctrans")
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
            if isinstance(pred, (tuple, list)):  # cctrans returns extras
                pred = pred[0]
            return jnp.mean((pred - dmap * LOG_PARA) ** 2), nbs

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), nbs, opt_state2, loss

    @jax.jit
    def jpred(params, bstats, img):
        vv = {"params": params}
        if has_bn:
            vv["batch_stats"] = bstats
        pred = model.apply(vv, img, train=False)
        if isinstance(pred, (tuple, list)):
            pred = pred[0]
        return jnp.sum(pred) / LOG_PARA

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


def ab_run_isw(epochs: int = 2, lr: float = 1e-4, seed: int = 0,
               optimizer: str = "sgd"):
    """Lockstep A/B for the full 3-phase ISW protocol against the ACTUAL
    reference module (models/ISW/__init__.py:21-122), CPU via the
    reference_oracle shims.

    Phases, mirroring dgtrainer.py:194-204 + predict2 (:86-102) on a
    compressed schedule (mask after epoch 0 instead of epoch 5):
      epoch 0       train with apply_wtloss=False (wt term zero)
      epoch 0 val   per-sample covstat accumulation on two views
                    (model([v1,v2], cal_covstat=True) vs our cov_stats)
      after val     set_mask_matrix on BOTH sides — reference does this
                    lazily at the first apply_wtloss forward
                    (cov_settings.py:44-47) from the same accumulated
                    stats, so an explicit call is equivalent; masks are
                    compared entry-wise (topk over variance-of-cov;
                    relax_denom=2 margin path, the shipped default)
      epoch ≥ 1     train with total = mse + 0.6·wt on both sides

    Returns (rows, mask_agreements): rows are per-epoch
    (epoch, t_mse, j_mse, t_wt, j_wt, t_mae, j_mae)."""
    import contextlib
    import io

    import numpy as np
    import torch
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax

    from reference_oracle import ref_import
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.core.registry import MODELS
    from dgvcc_tpu.models.whitening import IswCovTracker
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    torch.manual_seed(seed)
    ISW = ref_import("models.ISW")
    with contextlib.redirect_stdout(io.StringIO()):
        ref = ISW.ISWCounter_ResNet(criterion=torch.nn.MSELoss())

    root = tempfile.mkdtemp(prefix="ab_isw_")
    build_data(root, seed)
    loader, val_ds = make_loader(root, 1, seed)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    model = MODELS.build("isw", pretrained=False)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 3)), train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    params, bstats = v2["params"], v2["batch_stats"]
    tracker = IswCovTracker()

    tx = optax.sgd(lr) if optimizer == "sgd" else optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, bstats, opt_state, img, gts, masks, nums, margins,
              apply_wt):
        def loss_fn(p):
            out, nv = model.apply(
                {"params": p, "batch_stats": bstats}, img, gts=gts,
                masks=masks, num_sensitive=nums, margins=margins,
                apply_wtloss=apply_wt, train=True, mutable=["batch_stats"])
            l1, wt = out
            return l1 + 0.6 * wt, (nv["batch_stats"], l1, wt)

        (_, (nbs, l1, wt)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), nbs, opt2, l1, wt

    @jax.jit
    def jpred(params, bstats, img):
        return jnp.sum(model.apply({"params": params, "batch_stats": bstats},
                                   img, train=False)) / LOG_PARA

    @jax.jit
    def jcov(params, bstats, x2):
        return model.apply({"params": params, "batch_stats": bstats}, x2,
                           method="cov_stats")

    topt = (torch.optim.SGD(ref.parameters(), lr=lr) if optimizer == "sgd"
            else torch.optim.Adam(ref.parameters(), lr=lr))

    def nchw(a):
        return torch.tensor(np.ascontiguousarray(
            np.transpose(a, (0, 3, 1, 2))))

    def torch_step(img, dmap, apply_wt):
        topt.zero_grad()
        # reference scales gts ×1000 internally (ISW/__init__.py:109)
        out = ref(nchw(img), gts=nchw(dmap), apply_wtloss=apply_wt)
        (out[0] + 0.6 * out[1]).backward()
        topt.step()
        return float(out[0].detach()), float(out[1].detach())

    def val_epoch(do_covstat):
        ref.eval()
        tm, jm = [], []
        for i in range(len(val_ds)):
            s = val_ds[i]
            gt = len(s["gt"])
            img = s["img1"][None]
            with torch.no_grad():
                tp = float(ref(nchw(img)).sum()) / LOG_PARA
            jp = float(jpred(params, bstats, jnp.asarray(img)))
            tm.append(abs(tp - gt))
            jm.append(abs(jp - gt))
            if do_covstat:
                # deterministic second view, identical on both sides
                # (dgtrainer feeds den_cls's photometric view pair)
                rng = np.random.default_rng(7000 + i)
                img2 = (img + rng.normal(0, 0.05, img.shape)
                        ).astype(np.float32)
                with torch.no_grad():
                    ref([nchw(img), nchw(img2)], cal_covstat=True)
                stats = jcov(params, bstats,
                             jnp.concatenate([jnp.asarray(img),
                                              jnp.asarray(img2)]))
                tracker.add({k: np.asarray(v) for k, v in stats.items()})
        ref.train()
        return float(np.mean(tm)), float(np.mean(jm))

    ref.train()
    print(f"A/B isw: {epochs} epochs, lr={lr}, 3-phase protocol "
          f"(mask after epoch 0), optimizer={optimizer}")
    print(f"{'epoch':>5} {'torch mse':>11} {'tpu mse':>11} "
          f"{'torch wt':>10} {'tpu wt':>10} {'torch MAE':>10} "
          f"{'tpu MAE':>10}")
    rows, mask_agreements = [], []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        apply_wt = epoch >= 1
        masks, nums, margins = tracker.mask_batch()
        t1 = t2 = j1 = j2 = 0.0
        nb = 0
        for batch in loader:
            img = np.asarray(batch["img1"], np.float32)
            dmap = np.asarray(batch["dmap"], np.float32)
            a, b = torch_step(img, dmap, apply_wt)
            t1 += a
            t2 += b
            params, bstats, opt_state, l1, wt = jstep(
                params, bstats, opt_state, jnp.asarray(img),
                jnp.asarray(dmap) * LOG_PARA, masks, nums, margins,
                apply_wt)
            j1 += float(l1)
            j2 += float(wt)
            nb += 1
        tmae, jmae = val_epoch(do_covstat=epoch == 0)
        if epoch == 0:
            # snapshot the accumulated variance-of-covariance BEFORE the
            # selection resets it — used to weigh mask disagreements
            var_mats = [v / tracker.count for v in tracker.var]
            for i, cm in enumerate(ref.cov_matrix_layer):
                tv = (cm.var_matrix / cm.count_var_cov).detach().numpy()
                jv = var_mats[i]
                denom = np.abs(tv).max() + 1e-30
                print(f"site {i}: var-matrix maxreldiff "
                      f"{np.abs(tv - jv).max() / denom:.3e} "
                      f"(max {tv.max():.3e})")
            with contextlib.redirect_stdout(io.StringIO()):
                ref.set_mask_matrix()
            tracker.set_mask_matrix()
            for i, cm in enumerate(ref.cov_matrix_layer):
                t_mask = cm.mask_matrix.detach().numpy()
                j_mask = tracker.masks[i]
                raw = float((t_mask == j_mask).mean())
                # Instance whitening drives off-diagonal covariances
                # toward 0, so the ~C²/4 variance values pack densely
                # near the topk cutoff and float-noise reorders many
                # near-ties — entry-level agreement is ill-conditioned.
                # The well-conditioned check: disagreeing entries must
                # carry a negligible share of the selected variance mass
                # (i.e. every disagreement is a swap between near-equal
                # entries straddling the cutoff, which leaves the
                # whitening loss unchanged).
                v = var_mats[i]
                xor = t_mask != j_mask
                share = float(v[xor].sum() / max(v[t_mask == 1].sum(),
                                                 1e-30))
                mask_agreements.append(
                    (raw, share, float(t_mask.sum()), float(j_mask.sum())))
        rows.append((epoch, t1 / nb, j1 / nb, t2 / nb, j2 / nb, tmae, jmae))
        print(f"{epoch:5d} {t1 / nb:11.4f} {j1 / nb:11.4f} "
              f"{t2 / nb:10.6f} {j2 / nb:10.6f} {tmae:10.3f} "
              f"{jmae:10.3f}", flush=True)
    print("mask per site (agreement, xor-var-share, n_t, n_j): "
          + str([("%.4f" % r, "%.2e" % s, int(nt), int(nj))
                 for r, s, nt, nj in mask_agreements]))
    return rows, mask_agreements


def ab_run_full_recipe(epochs: int = 20, lr: float = 1e-3,
                       weight_decay: float = 1e-4, seed: int = 0,
                       mem_size: int = 64, mem_dim: int = 64,
                       crop: int = 64, ema: float = 0.9):
    """The SHIPPED-RECIPE convergence A/B (VERDICT r3 item 3): mode
    'final' on two-view den_cls data with AdamW + per-epoch OneCycleLR —
    the full configs/sta_final.yml stack — reference torch trainer
    semantics (dgtrainer.py:183-190, trainer.py:82-87 per-epoch
    scheduler.step, AdamW decoupled weight decay) vs dgvcc_tpu's
    PRODUCTION components (build_train_step('final'), build_optimizer
    adamw, build_scheduler onecycle, TrainState EMA shadow).

    This is the arm that catches optax-vs-torch AdamW weight-decay
    coupling and scheduler-step placement differences — the SGD
    lockstep arms can't see them. Dropout is disabled (den/cls p=0) so
    train-mode forwards are deterministic on both sides; everything
    else is the shipped recipe. The reference has no EMA, so the EMA
    column is reported for our side only (informational).

    Geometry: full DGModel_final architecture with a reduced memory
    bank (mem_size/mem_dim 64) and 64^2 crops for CPU tractability —
    the optimizer/scheduler semantics under test are size-independent.
    """
    import numpy as np
    import torch
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from reference_oracle import ref_import
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.losses  # noqa: F401
    from dgvcc_tpu.core.registry import DATASETS, LOSSES, MODELS
    from dgvcc_tpu.data.loader import DataLoader
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint
    from dgvcc_tpu.train.optim import build_optimizer, build_scheduler
    from dgvcc_tpu.train.state import TrainState
    from dgvcc_tpu.train.steps import build_train_step, jit_train_step
    import dgvcc_tpu.data  # noqa: F401

    torch.manual_seed(seed)
    ref = ref_import("models.models").DGModel_final(
        pretrained=False, mem_size=mem_size, mem_dim=mem_dim,
        den_dropout=0.0, cls_dropout=0.0)

    root = tempfile.mkdtemp(prefix="ab_full_")
    build_data(root, seed)
    train = DATASETS.build("den_cls", method="train", root=root,
                           crop_size=crop, downsample=1, unit_size=16)
    val_ds = DATASETS.build("den_cls", method="val", root=root,
                            crop_size=crop, downsample=1, unit_size=16)
    loader = DataLoader(train, batch_size=8, shuffle=True, seed=seed)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    model = MODELS.build("final", pretrained=False, mem_size=mem_size,
                         mem_dim=mem_dim, den_dropout=0.0, cls_dropout=0.0)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, crop, crop, 3)), train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)

    tx = build_optimizer({"name": "adamw",
                          "params": {"lr": lr,
                                     "weight_decay": weight_decay}})
    sched_params = {"max_lr": lr, "epochs": epochs, "steps_per_epoch": 15,
                    "final_div_factor": 1000}  # sta_final.yml:59-65 shape
    sched = build_scheduler({"name": "onecycle", "params": sched_params}, lr)
    params = v2["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=v2.get("batch_stats", {}), opt_state=tx.init(params),
        tx=tx,
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        ema_decay=jnp.asarray(ema, jnp.float32) if ema else None)
    loss_obj = LOSSES.build("mse")
    step = jit_train_step(build_train_step(model, loss_obj, "final", LOG_PARA),
                          donate=False)

    topt = torch.optim.AdamW(ref.parameters(), lr=lr,
                             weight_decay=weight_decay)
    tsched = torch.optim.lr_scheduler.OneCycleLR(topt, **sched_params)
    tmse = torch.nn.MSELoss()

    def nchw(a):
        return torch.tensor(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))

    def torch_step(batch):
        # dgtrainer.py:183-190 'final' protocol, verbatim semantics
        x1, x2 = nchw(batch["img1"]), nchw(batch["img2"])
        y = nchw(batch["dmap"])
        cgt = nchw(batch["bmap"])
        topt.zero_grad()
        dc1, dc2, c1, c2, _cerr, loss_con, _ = ref.forward_train(x1, x2, cgt)
        loss_den = tmse(dc1, y * LOG_PARA) + tmse(dc2, y * LOG_PARA)
        loss_cls = (torch.nn.functional.binary_cross_entropy(c1, cgt)
                    + torch.nn.functional.binary_cross_entropy(c2, cgt))
        total = loss_den + 10 * loss_cls + 10 * loss_con
        total.backward()
        topt.step()
        return float(total.detach())

    def jpred(p, bstats, img):
        out = model.apply({"params": p, "batch_stats": bstats}, img)
        return float(jnp.sum(out[0]) / LOG_PARA)

    def val_mae():
        ref.eval()
        tm, jm, em = [], [], []
        for i in range(len(val_ds)):
            s = val_ds[i]
            gt = len(s["gt"])
            img = s["img1"][None]
            with torch.no_grad():
                tp = float(ref(nchw(img))[0].sum()) / LOG_PARA
            tm.append(abs(tp - gt))
            jm.append(abs(jpred(state.params, state.batch_stats,
                                jnp.asarray(img)) - gt))
            if ema:
                em.append(abs(jpred(state.ema_params, state.batch_stats,
                                    jnp.asarray(img)) - gt))
        ref.train()
        return (float(np.mean(tm)), float(np.mean(jm)),
                float(np.mean(em)) if ema else float("nan"))

    print(f"full-recipe A/B (mode 'final', den_cls two-view, AdamW "
          f"wd={weight_decay}, per-epoch OneCycleLR, {epochs} epochs; "
          f"EMA decay {ema} on the tpu side only)")
    print(f"{'epoch':>5} {'lr':>9} {'torch loss':>11} {'tpu loss':>11} "
          f"{'torch MAE':>10} {'tpu MAE':>10} {'tpu EMA MAE':>11}")
    rows = []
    for epoch in range(epochs):
        # per-epoch LR on both sides: torch sets lr_at(e) via the
        # scheduler constructed at lr_at(0) + e end-of-epoch step()s;
        # ours injects the same closed form
        state = state.set_learning_rate(sched.lr_at(epoch))
        loader.set_epoch(epoch)
        tl = jl = 0.0
        nb = 0
        for batch in loader:
            b = {k: jnp.asarray(np.asarray(v, np.float32))
                 for k, v in batch.items()
                 if k in ("img1", "img2", "dmap", "bmap")}
            nb += 1
            tl += torch_step({k: np.asarray(v) for k, v in b.items()})
            state, metrics = step(state, b, jax.random.PRNGKey(0),
                                  jnp.int32(epoch))
            jl += float(metrics["loss_total"])
        tsched.step()
        tmae, jmae, emae = val_mae()
        tlr = topt.param_groups[0]["lr"]
        rows.append((epoch, tl / nb, jl / nb, tmae, jmae, emae))
        print(f"{epoch:5d} {sched.lr_at(epoch):9.2e} {tl / nb:11.4f} "
              f"{jl / nb:11.4f} {tmae:10.3f} {jmae:10.3f} {emae:11.3f}",
              flush=True)
        # scheduler parity guard: after e steps torch must sit at our
        # lr_at(e+1) (both per-epoch); catches placement drift live
        assert abs(tlr - sched.lr_at(epoch + 1)) <= 1e-9 + 1e-6 * tlr, (
            f"scheduler divergence at epoch {epoch}: torch {tlr} vs "
            f"ours {sched.lr_at(epoch + 1)}")
    t3 = np.mean([r[3] for r in rows[-3:]])
    j3 = np.mean([r[4] for r in rows[-3:]])
    e3 = np.mean([r[5] for r in rows[-3:]])
    print(f"\nfinal-3-epoch mean val MAE: torch {t3:.3f} | "
          f"dgvcc_tpu {j3:.3f} | dgvcc_tpu EMA {e3:.3f}")
    return rows


def ab_run_bay(epochs: int = 12, lr: float = 1e-5, seed: int = 0,
               crop: int = 64):
    """Bayesian-loss TRAINING A/B (VERDICT r4 item 5): BL-VGG trained
    end-to-end with the Bayesian loss — the reference's Post_Prob +
    Bay_Loss (losses/bl.py) consumed through the dgtrainer BL branch
    semantics (dgtrainer.py:59-64: loss(gts, st_sizes, targs, pred))
    vs our PRODUCTION components: the bay dataset's padded point
    batches through build_train_step('simple') + the registered 'bl'
    loss (losses/bayesian.py). Identical init weights (converter),
    identical batches (both consume the padded bay loader output; the
    torch side unpads via pt_mask), SGD both sides.

    This closes the gap the loss-level torch goldens leave open:
    gradient flow through the posterior matmul + 90%-trim topk under a
    real optimizer. log_para=1 (the reference's BL recipe trains the
    raw density; BENCH_NOTES 'bay caveat')."""
    import numpy as np
    import torch
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax

    from reference_oracle import ref_import
    import dgvcc_tpu.models  # noqa: F401
    import dgvcc_tpu.losses  # noqa: F401
    from dgvcc_tpu.core.registry import DATASETS, LOSSES, MODELS
    from dgvcc_tpu.data.loader import DataLoader
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint
    import dgvcc_tpu.data  # noqa: F401

    torch.manual_seed(seed)
    ref = ref_import("models.baselines.BL").BL_VGG(pretrained=False)
    tbl = ref_import("losses.bl").BL(
        sigma=8.0, c_size=crop, stride=8, background_ratio=0.15,
        use_background=True, device="cpu")

    root = tempfile.mkdtemp(prefix="ab_bay_")
    build_data(root, seed)
    train = DATASETS.build("bay", method="train", root=root,
                           crop_size=crop, downsample=8, unit_size=16)
    val_ds = DATASETS.build("den", method="val", root=root, crop_size=crop,
                            downsample=8, unit_size=16)
    loader = DataLoader(train, batch_size=8, shuffle=True, seed=seed)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    model = MODELS.build("bl", pretrained=False)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, crop, crop, 3)), train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    params = v2["params"]

    jloss = LOSSES.build("bl", sigma=8.0, c_size=crop, stride=8,
                         background_ratio=0.15, use_background=True)
    tx = optax.sgd(lr)
    opt_state = tx.init(params)
    # the PRODUCTION loss path: _count_loss's BL branch inside the
    # 'simple' fused step would also update (empty) batch_stats; BL-VGG
    # is norm-free so drive the loss function directly through the same
    # dispatch the trainer uses (train/steps.py::_count_loss)
    from dgvcc_tpu.train.steps import _count_loss

    @jax.jit
    def jstep(params, opt_state, batch):
        def f(p):
            pred = model.apply({"params": p}, batch["img1"], train=False)
            return _count_loss(jloss, pred, batch, 1.0)

        loss, g = jax.value_and_grad(f)(params)
        updates, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def jpred(params, img):
        return jnp.sum(model.apply({"params": params}, img, train=False))

    topt = torch.optim.SGD(ref.parameters(), lr=lr)

    def torch_step(batch):
        x = torch.tensor(np.ascontiguousarray(
            np.transpose(batch["img1"], (0, 3, 1, 2)), np.float32))
        # unpad: the reference consumes ragged per-image point/target
        # lists (bay_crowd_dataset collate, train_helper.py)
        gts, targs = [], []
        for i in range(x.shape[0]):
            m = batch["pt_mask"][i]
            gts.append(torch.tensor(batch["points"][i][m], dtype=torch.float32))
            targs.append(torch.tensor(batch["targets"][i][m],
                                      dtype=torch.float32))
        st = torch.tensor(np.asarray(batch["st_sizes"], np.float32))
        topt.zero_grad()
        pred = ref(x)
        lv = tbl(gts, st, targs, pred)
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
                    np.transpose(img, (0, 3, 1, 2))))).sum())
            jp = float(jpred(params, jnp.asarray(img)))
            tm.append(abs(tp - gt))
            jm.append(abs(jp - gt))
        ref.train()
        return float(np.mean(tm)), float(np.mean(jm))

    print(f"bayesian A/B (BL-VGG + Post_Prob/Bay_Loss end-to-end, SGD "
          f"lr={lr}, {epochs} epochs, crop {crop}, stride 8)")
    print(f"{'epoch':>5} {'torch loss':>11} {'tpu loss':>11} "
          f"{'torch MAE':>10} {'tpu MAE':>10}")
    rows = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        tl = jl = 0.0
        nb = 0
        for batch in loader:
            b = {k: np.asarray(v) for k, v in batch.items()}
            tl += torch_step(b)
            jb = {"img1": jnp.asarray(b["img1"], jnp.float32),
                  "points": jnp.asarray(b["points"], jnp.float32),
                  "pt_mask": jnp.asarray(b["pt_mask"]),
                  "targets": jnp.asarray(b["targets"], jnp.float32),
                  "st_sizes": jnp.asarray(b["st_sizes"], jnp.float32)}
            params, opt_state, l2 = jstep(params, opt_state, jb)
            jl += float(l2)
            nb += 1
        tmae, jmae = val_mae()
        rows.append((epoch, tl / nb, jl / nb, tmae, jmae))
        print(f"{epoch:5d} {tl / nb:11.4f} {jl / nb:11.4f} "
              f"{tmae:10.3f} {jmae:10.3f}", flush=True)
    t3 = np.mean([r[3] for r in rows[-3:]])
    j3 = np.mean([r[4] for r in rows[-3:]])
    print(f"\nfinal-3-epoch mean val MAE: torch {t3:.3f} | "
          f"dgvcc_tpu {j3:.3f}")
    return rows


if __name__ == "__main__":
    # the harness is a CPU numerics-identity tool (docstring) — run
    # standalone it must NOT land on the TPU relay (the env pins
    # JAX_PLATFORMS=axon; under pytest, conftest.py forces cpu)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="mcnn",
                    choices=["mcnn", "bl", "dg_base", "ibn", "sw", "isw",
                             "sw_vgg", "csrnet", "dssinet", "sasnet",
                             "cctrans", "full_recipe", "bay"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    a = ap.parse_args()
    if a.family == "isw":
        ab_run_isw(a.epochs, a.lr, a.seed, a.optimizer)
    elif a.family == "full_recipe":
        ab_run_full_recipe(epochs=a.epochs, seed=a.seed)
    elif a.family == "bay":
        ab_run_bay(epochs=a.epochs, lr=a.lr, seed=a.seed)
    else:
        ab_run(a.family, a.epochs, a.lr, a.seed, a.optimizer)
