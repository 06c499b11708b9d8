"""Whitening family tests: SwitchWhiten parity vs a torch golden,
Newton-Schulz correctness, IBN parity, counter shapes, ISW protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from dgvcc_tpu.nn.whitening import (
    IBN,
    InstanceNorm,
    SwitchWhiten,
    get_covariance_matrix,
    instance_whitening_loss,
    newton_schulz_inv_sqrt,
)


def test_newton_schulz_inverts_sqrt():
    """T=8 on a moderately conditioned SPD batch gives wm cov wm ≈ I.
    (The one-sided iteration is NOT monotone in f32 — it converges by
    ~T=8 then diverges from roundoff; the reference runs T=5 as an
    approximation, compensated by the learned affine.)"""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 8, 8)).astype(np.float32)
    cov = a @ np.transpose(a, (0, 2, 1)) + 0.5 * np.eye(8, dtype=np.float32)
    wm = np.asarray(newton_schulz_inv_sqrt(jnp.asarray(cov), iters=8))
    recon = wm @ cov @ wm
    np.testing.assert_allclose(recon, np.broadcast_to(np.eye(8), recon.shape),
                               atol=2e-2)


def torch_switch_whiten(x_nchw, mean_w, var_w, weight, bias, num_pergroup=16,
                        T=5, eps=1e-5, training=True):
    """Golden re-derivation of SwitchWhiten2d (sw_type=2) forward math."""
    x = torch.tensor(x_nchw)
    N, C, H, W = x.shape
    c, g = num_pergroup, C // num_pergroup

    in_t = x.transpose(0, 1).contiguous().view(g, c, -1)
    mean_bn = in_t.mean(-1, keepdim=True)
    in_bn = in_t - mean_bn
    cov_bn = torch.bmm(in_bn, in_bn.transpose(1, 2)).div(H * W * N)

    mean_bn = mean_bn.view(1, g, c, 1).expand(N, g, c, 1).reshape(N * g, c, 1)
    cov_bn = cov_bn.view(1, g, c, c).expand(N, g, c, c).reshape(N * g, c, c)

    in_data = x.reshape(N * g, c, -1)
    eye = torch.eye(c).view(1, c, c).expand(N * g, c, c)
    mean_in = in_data.mean(-1, keepdim=True)
    x_in = in_data - mean_in
    cov_in = torch.bmm(x_in, x_in.transpose(1, 2)).div(H * W)

    mw = torch.softmax(torch.tensor(mean_w), 0)
    vw = torch.softmax(torch.tensor(var_w), 0)
    mean = mw[0] * mean_bn + mw[1] * mean_in
    cov = vw[0] * cov_bn + vw[1] * cov_in + eps * eye

    p = torch.eye(c).to(cov).expand(N * g, c, c).clone()
    r_tr = (cov * torch.eye(c)).sum((1, 2), keepdim=True).reciprocal()
    cov_n = cov * r_tr
    for _ in range(T):
        p = 1.5 * p - 0.5 * torch.matmul(torch.matrix_power(p, 3), cov_n)
    wm = p * r_tr.sqrt()

    x_hat = torch.bmm(wm, in_data - mean).view(N, C, H, W)
    x_hat = x_hat * torch.tensor(weight).view(1, C, 1, 1) + \
        torch.tensor(bias).view(1, C, 1, 1)
    return x_hat.numpy()


def test_switch_whiten_matches_torch_golden():
    rng = np.random.default_rng(1)
    N, H, W, C = 2, 6, 6, 32
    x = rng.normal(0, 1, (N, H, W, C)).astype(np.float32)
    mean_w = rng.normal(size=2).astype(np.float32)
    var_w = rng.normal(size=2).astype(np.float32)
    weight = rng.uniform(0.5, 1.5, C).astype(np.float32)
    bias = rng.normal(0, 0.1, C).astype(np.float32)

    sw = SwitchWhiten(num_features=C, num_pergroup=16, sw_type=2, T=5)
    variables = {
        "params": {"sw_mean_weight": mean_w, "sw_var_weight": var_w,
                   "weight": weight, "bias": bias},
        "batch_stats": {"running_mean": np.zeros((2, 16, 1), np.float32),
                        "running_cov": np.zeros((2, 16, 16), np.float32)},
    }
    out, mut = sw.apply(variables, jnp.asarray(x), train=True,
                        mutable=["batch_stats"])
    golden = torch_switch_whiten(np.transpose(x, (0, 3, 1, 2)),
                                 mean_w, var_w, weight, bias)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)
    # running stats updated with momentum 0.99 from zero init
    rm = np.asarray(mut["batch_stats"]["running_mean"])
    assert np.abs(rm).max() > 0


def test_switch_whiten_eval_uses_running_stats():
    rng = np.random.default_rng(2)
    C = 16
    x = rng.normal(0, 1, (2, 4, 4, C)).astype(np.float32)
    sw = SwitchWhiten(num_features=C, num_pergroup=16)
    variables = sw.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # train once to populate stats
    _, mut = sw.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    v2 = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    out1 = sw.apply(v2, jnp.asarray(x), train=False)
    out2 = sw.apply(v2, jnp.asarray(x * 1.0), train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_ibn_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 5, 5, 8)).astype(np.float32)
    ibn = IBN(planes=8)
    variables = ibn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    out = ibn.apply(variables, jnp.asarray(x), train=True,
                    mutable=["batch_stats"])[0]

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    y1 = TF.instance_norm(xt[:, :4], eps=1e-5)
    y2 = TF.batch_norm(xt[:, 4:], None, None,
                       torch.ones(4), torch.zeros(4), training=True, eps=1e-5)
    golden = torch.cat([y1, y2], 1).numpy()
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)


def test_instance_whitening_loss_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    mask = (rng.uniform(size=(6, 6)) > 0.5).astype(np.float32)
    ours = float(instance_whitening_loss(jnp.asarray(x), jnp.asarray(mask), 0.0, 7.0))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2))).reshape(2, 6, -1)
    f_cor = torch.bmm(xt, xt.transpose(1, 2)).div(16 - 1) + 1e-5 * torch.eye(6)
    masked = f_cor * torch.tensor(mask)
    off = torch.sum(torch.abs(masked), dim=(1, 2), keepdim=True) - 0.0
    golden = float(torch.sum(torch.clamp(off / 7.0, min=0)) / 2)
    assert ours == pytest.approx(golden, rel=1e-4)


# --------------------------------------------------------------------------
# counters
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def counter_input():
    return jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)),
                       jnp.float32)


@pytest.mark.parametrize("name", ["sw", "ibn"])
def test_counter_shapes(name, counter_input):
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401

    model = MODELS.build(name)
    variables = model.init(jax.random.PRNGKey(0), counter_input)
    d = model.apply(variables, counter_input)
    assert d.shape == (1, 64, 64, 1)


def test_isw_protocol(counter_input):
    from dgvcc_tpu.core.registry import MODELS
    from dgvcc_tpu.models.whitening import IswCovTracker
    import dgvcc_tpu.models  # noqa: F401

    model = MODELS.build("isw")
    variables = model.init(jax.random.PRNGKey(0), counter_input)

    # (c) eval
    d = model.apply(variables, counter_input)
    assert d.shape == (1, 64, 64, 1)

    # (b) covariance stats on concat of two views
    x2 = jnp.concatenate([counter_input, counter_input * 0.9], axis=0)
    stats = model.apply(variables, x2, method=model.cov_stats)
    assert set(stats) == {"m0", "m1", "m2"}
    assert stats["m0"].shape == (64, 64)
    assert stats["m1"].shape == (256, 256)
    assert stats["m2"].shape == (512, 512)

    tracker = IswCovTracker()
    tracker.add({k: np.asarray(v) for k, v in stats.items()})
    tracker.set_mask_matrix()
    masks, nums, _margins = tracker.mask_batch()
    # relax_denom=2 → keep num_off - num_off//2 sensitive entries
    d0 = 64
    num_off = d0 * (d0 - 1) // 2
    assert float(nums["m0"]) == num_off - num_off // 2

    # (a) training forward with masks
    gts = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out, _ = model.apply(
        variables, counter_input, gts=gts, masks=masks, num_sensitive=nums,
        apply_wtloss=True, train=True, mutable=["batch_stats"],
    )
    task, wt = out
    assert np.isfinite(float(task)) and np.isfinite(float(wt)) and float(wt) >= 0


def test_kmeans_1d():
    from dgvcc_tpu.models.whitening import kmeans_1d

    v = np.concatenate([np.zeros(50), np.ones(30), np.full(20, 5.0)])
    labels, cents = kmeans_1d(v, 3)
    assert (labels[:50] == 0).all()
    assert (labels[50:80] == 1).all()
    assert (labels[80:] == 2).all()


def test_isw_train_step_integration():
    """mode='isw' through the generic train-step builder, masks in batch."""
    from dgvcc_tpu.core.registry import MODELS, LOSSES
    from dgvcc_tpu.models.whitening import IswCovTracker
    from dgvcc_tpu.train.state import create_train_state
    from dgvcc_tpu.train.steps import build_train_step, jit_train_step
    from dgvcc_tpu.train.optim import build_optimizer
    import dgvcc_tpu.losses  # noqa: F401

    model = MODELS.build("isw")
    tx = build_optimizer({"name": "sgd", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = jit_train_step(build_train_step(model, loss, "isw", 1000.0), donate=False)

    tracker = IswCovTracker()
    masks, nums, _m = tracker.mask_batch()  # pre-stats: zero masks
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "dmap": jnp.asarray(rng.uniform(0, 0.01, (2, 32, 32, 1)).astype(np.float32)),
        "isw_masks": masks, "isw_nums": nums,
    }
    state, m = step(state, batch, jax.random.PRNGKey(1), jnp.int32(0))
    assert np.isfinite(float(m["loss_total"]))
    assert float(m["loss_wt"]) == 0.0  # zero masks → zero wt loss
    # epoch 7: wt loss contributes
    state, m7 = step(state, batch, jax.random.PRNGKey(2), jnp.int32(7))
    assert np.isfinite(float(m7["loss_total"]))


def test_resnet_basic_block_trunk():
    """resnet18-style trunk (BasicBlock) with SW + post-IN options."""
    from dgvcc_tpu.nn.resnet import ResNetTrunk, RESNET_LAYERS, RESNET_BLOCK

    trunk = ResNetTrunk(layers=RESNET_LAYERS[18], block=RESNET_BLOCK[18],
                        num_stages=3, stem_norm="bn",
                        stage_sw=(True, False, False, False),
                        stage_post=(None, "in", None, None))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = trunk.init(jax.random.PRNGKey(0), x)
    feats, w_arr = trunk.apply(variables, x)
    # basic block: stage3 (k=2) has 256 channels, stride 16
    assert feats.shape == (1, 4, 4, 256)
    assert w_arr == []

def test_kmeans1d_exact_golden():
    """Golden from the kmeans1d package's published example (README):
    the exact DP must reproduce it; Lloyd from a bad init would not."""
    from dgvcc_tpu.utils.kmeans1d import cluster, _cluster_python

    x = [4.0, 4.1, 4.2, -50, 200.2, 200.4, 200.9, 80, 100, 102]
    labels, centroids = cluster(x, 4)
    assert labels == [1, 1, 1, 0, 3, 3, 3, 2, 2, 2]
    np.testing.assert_allclose(centroids, [-50.0, 4.1, 94.0, 200.5])

    # python fallback agrees with the dispatcher (native when available)
    v = np.sort(np.asarray(x, np.float64))
    lp, cp = _cluster_python(v, 4)
    assert list(lp) == sorted(labels)
    np.testing.assert_allclose(cp, centroids)


def test_kmeans1d_native_matches_python():
    """C++ backend == numpy fallback on random data (exact DP in both)."""
    from dgvcc_tpu.utils.kmeans1d import _cluster_python, _load_library, cluster

    if _load_library() is None:
        import pytest
        pytest.skip("native kmeans1d not built")
    rng = np.random.default_rng(0)
    v = rng.normal(size=500) * np.repeat([1.0, 10.0, 0.1], [200, 150, 150])
    labels, cents = cluster(v, 7)
    order = np.argsort(v, kind="stable")
    lp, cp = _cluster_python(np.ascontiguousarray(np.sort(v)), 7)
    np.testing.assert_array_equal(np.asarray(labels)[order], lp)
    np.testing.assert_allclose(cents, cp, rtol=1e-12)
    # optimality sanity: total SSE <= Lloyd-style quantile partition SSE
    def sse_of(lab):
        lab = np.asarray(lab)
        return sum(((v[lab == j] - v[lab == j].mean()) ** 2).sum()
                   for j in np.unique(lab))
    qlab = np.digitize(v, np.quantile(v, np.linspace(0, 1, 8)[1:-1]))
    assert sse_of(labels) <= sse_of(qlab) + 1e-9


def test_irw_tracker_masks():
    """CovMatrix_IRW semantics (cov_settings.py:91-107): static upper-
    triangle mask, margin = num_off // relax_denom, denominator =
    num_off_diagonal."""
    from dgvcc_tpu.models.whitening import IrwCovTracker

    tracker = IrwCovTracker(dims=(8, 16), relax_denom=2.0)
    assert not tracker.has_stats()
    tracker.set_mask_matrix()  # no-op
    masks, nums, margins = tracker.mask_batch()
    m0 = np.asarray(masks["m0"])
    assert m0.shape == (8, 8)
    np.testing.assert_array_equal(m0, np.triu(np.ones((8, 8)), k=1))
    assert float(nums["m0"]) == 28.0  # 8*7/2
    assert float(margins["m0"]) == 14.0  # 28 // 2


def test_isw_train_step_irw_margins():
    """IRW masks + margins flow through the isw train step."""
    from dgvcc_tpu.core.registry import MODELS, LOSSES
    from dgvcc_tpu.models.whitening import IrwCovTracker
    from dgvcc_tpu.train.state import create_train_state
    from dgvcc_tpu.train.steps import build_train_step, jit_train_step
    from dgvcc_tpu.train.optim import build_optimizer
    import dgvcc_tpu.losses  # noqa: F401

    model = MODELS.build("isw", layers=(1, 1, 1))
    tx = build_optimizer({"name": "sgd", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    loss = LOSSES.build("mse")
    step = jit_train_step(build_train_step(model, loss, "isw", 1000.0),
                          donate=False)
    masks, nums, margins = IrwCovTracker(relax_denom=2.0).mask_batch()
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "dmap": jnp.asarray(rng.uniform(0, 0.01, (2, 32, 32, 1)).astype(np.float32)),
        "isw_masks": masks, "isw_nums": nums, "isw_margins": margins,
    }
    state, m = step(state, batch, jax.random.PRNGKey(1), jnp.int32(7))
    assert np.isfinite(float(m["loss_total"]))
    assert float(m["loss_wt"]) >= 0.0


def test_kmeans1d_prebuilt_so_used_when_compiler_missing(monkeypatch):
    """If the recompile path fails (no g++ / stale-looking mtime), the
    shipped prebuilt libkmeans1d.so must still be tried before the
    numpy fallback."""
    import os
    import subprocess

    import dgvcc_tpu.utils.kmeans1d as km

    if not os.path.exists(km._SO):
        import pytest
        pytest.skip("no prebuilt .so on disk")

    monkeypatch.setattr(km, "_lib", None)
    monkeypatch.setattr(km, "_lib_failed", False)

    def boom(*a, **k):
        raise FileNotFoundError("g++ not found")

    monkeypatch.setattr(subprocess, "run", boom)
    # force the 'stale' branch by pretending the source is newer
    real_getmtime = os.path.getmtime
    monkeypatch.setattr(
        os.path, "getmtime",
        lambda p: real_getmtime(p) + (1e9 if p == km._SRC else 0))
    lib = km._load_library()
    assert lib is not None, "prebuilt .so should load when recompile fails"
    labels, cents = km.cluster(np.array([1.0, 1.1, 5.0, 5.1, 9.0]), 3)
    assert list(labels) == [0, 0, 1, 1, 2]
