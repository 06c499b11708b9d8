"""Shape/finiteness tests for the DG model family (all 6 variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvcc_tpu.core.registry import MODELS
import dgvcc_tpu.models  # noqa: F401  (registers factories)

H = W = 64  # multiple of 16 (stride-16 encoder tail)


def init_model(name, **params):
    model = MODELS.build(name, **params)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    return model, variables


@pytest.mark.parametrize("name", ["base", "mem"])
def test_forward_density_only(name):
    model, variables = init_model(name)
    x = jnp.ones((2, H, W, 3), jnp.float32)
    d = model.apply(variables, x)
    assert d.shape == (2, H, W, 1)
    assert bool(jnp.isfinite(d).all())
    assert bool((d >= 0).all())  # den_head ends in ReLU


@pytest.mark.parametrize("name", ["cls", "memcls", "final"])
def test_forward_with_cls(name):
    model, variables = init_model(name)
    x = jnp.ones((2, H, W, 3), jnp.float32)
    d, c = model.apply(variables, x)
    assert d.shape == (2, H, W, 1)
    assert c.shape == (2, H // 16, W // 16, 1)
    assert bool((c >= 0).all() and (c <= 1).all())  # sigmoid

    # training path with gt cls map
    c_gt = jnp.ones((2, H // 16, W // 16, 1), jnp.float32)
    d2, _ = model.apply(
        variables, x, c_gt=c_gt, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    assert d2.shape == (2, H, W, 1)


def test_forward_train_memadd():
    model, variables = init_model("memadd")
    x1 = jnp.ones((2, H, W, 3), jnp.float32)
    x2 = x1 * 0.5
    (d1, d2, loss_con), _ = model.apply(
        variables, x1, x2,
        method=model.forward_train,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert d1.shape == d2.shape == (2, H, W, 1)
    assert loss_con.shape == ()
    assert bool(jnp.isfinite(loss_con))


def test_forward_train_final():
    model, variables = init_model("final", has_err_loss=True)
    x1 = jnp.ones((2, H, W, 3), jnp.float32)
    x2 = x1 * 0.5
    c_gt = jnp.zeros((2, H // 16, W // 16, 1), jnp.float32)
    out, _ = model.apply(
        variables, x1, x2, c_gt,
        method=model.forward_train,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    dc1, dc2, c1, c2, c_err, loss_con, loss_err = out
    assert dc1.shape == dc2.shape == (2, H, W, 1)
    assert c1.shape == c2.shape == (2, H // 16, W // 16, 1)
    assert c_err.shape == (2, H // 4 * 4, W // 4 * 4, 1)[0:1] + (H, W, 1)
    assert bool(jnp.isfinite(loss_con)) and bool(jnp.isfinite(loss_err))


def test_memory_bank_math():
    """The memory attention re-expresses features as convex combos of
    prototypes: rows of the output lie in the prototype span, and the
    attention is a proper softmax (rows sum to 1)."""
    from dgvcc_tpu.models.dg import MemoryBank

    mb = MemoryBank(mem_size=16, mem_dim=8)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    variables = mb.init(jax.random.PRNGKey(1), y)
    y_new, logits = mb.apply(variables, y)
    assert y_new.shape == y.shape
    assert logits.shape == (1, 16, 16)
    attn = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
    # output rows live in span(mem): residual of least-squares fit ~ 0
    mem = np.asarray(variables["params"]["mem"])  # (k, S): prototypes are columns
    yn = np.asarray(y_new).reshape(-1, 8)
    coef, *_ = np.linalg.lstsq(mem, yn.T, rcond=None)
    np.testing.assert_allclose(mem @ coef, yn.T, atol=1e-4)


def test_variant_param_flags():
    import flax

    _, v_base = init_model("base")
    flat = flax.traverse_util.flatten_dict(v_base["params"], sep="/")
    assert not any("mem" in k for k in flat)
    _, v_final = init_model("final")
    flat = flax.traverse_util.flatten_dict(v_final["params"], sep="/")
    assert any(k.endswith("/mem") for k in flat)
    assert any("cls_conv1" in k for k in flat)


def test_remat_gradients_match():
    """remat=True recomputes activations in backward — gradients must be
    identical to the non-remat model."""
    model_a, var_a = init_model("base")
    model_r = MODELS.build("base", remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, H, W, 3)),
                    jnp.float32)

    def loss(variables, model):
        def f(params):
            d = model.apply({"params": params,
                             "batch_stats": variables["batch_stats"]}, x)
            return jnp.sum(d ** 2)
        return jax.grad(f)(variables["params"])

    g_a = loss(var_a, model_a)
    g_r = loss(var_a, model_r)  # same params, remat graph
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_resize_bilinear_ac_matches_torch():
    """resize_bilinear_ac == F.interpolate(align_corners=True) on
    integer and non-integer ratios, up and down (the legacy
    F.upsample_bilinear semantics used across the baselines)."""
    import torch
    import torch.nn.functional as TF

    from dgvcc_tpu.nn.layers import resize_bilinear_ac, upsample

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 9, 13, 4)).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    for hw in ((18, 26), (27, 39), (5, 7), (9, 13), (16, 20)):
        got = np.asarray(resize_bilinear_ac(jnp.asarray(x), hw))
        want = TF.interpolate(xt, size=hw, mode="bilinear",
                              align_corners=True).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                                   rtol=1e-5, atol=1e-5, err_msg=str(hw))
    # the upsample(..., align_corners=True) wrapper routes here
    got = np.asarray(upsample(jnp.asarray(x), 2, align_corners=True))
    want = TF.interpolate(xt, scale_factor=2, mode="bilinear",
                          align_corners=True).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


from dgvcc_tpu.testing import TINY_MEM as TINY  # shared tiny geometry


def test_batched_two_view_identical_views_match_unbatched():
    """batched_two_view=True differs from False ONLY through BatchNorm's
    train-mode statistics (union of the 2B batch vs per-view). With
    img1 == img2 those statistics coincide, so the two paths must agree
    to float reduction-order noise — dropout draws, masks, memory
    attention, and heads are bit-equivalent by construction
    (models/dg.py forward_train)."""
    # cls_dropout off: the cls head draws ONE 2B dropout mask under the
    # knob vs one mask per view without it — a genuine (documented)
    # rng-stream difference, orthogonal to the BN semantics under test
    kw = dict(TINY, pretrained=False, cls_dropout=0.0)
    m_off = MODELS.build("final", batched_two_view=False, **kw)
    m_on = MODELS.build("final", batched_two_view=True, **kw)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    v = m_off.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x0)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
    c_gt = jnp.asarray((rng.uniform(size=(2, H // 16, W // 16, 1)) > 0.5)
                       .astype(np.float32))
    outs = []
    for m in (m_off, m_on):
        (dc1, dc2, c1, c2, c_err, l_con, l_err), mut = m.apply(
            v, img, img, c_gt, method=m.forward_train,
            rngs={"dropout": jax.random.PRNGKey(5)},
            mutable=["batch_stats"])
        outs.append((dc1, dc2, c1, l_con, mut["batch_stats"]))
    for a, b in zip(outs[0][:4], outs[1][:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    # running stats relate by the documented one-vs-two momentum
    # updates per step: unbatched applies r <- m r + (1-m) s TWICE
    # (once per view), batched ONCE over the union. With identical
    # views s is the same, so from the init (mean 0, var 1):
    #   mean: off = (1-m^2) s = (1+m) * on
    #   var:  off - m^2 = (1+m) * (on - m)
    m = 0.9  # TorchBatchNorm momentum (nn/layers.py)
    pa = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
          jax.tree_util.tree_flatten_with_path(outs[0][4])[0]}
    pb = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
          jax.tree_util.tree_flatten_with_path(outs[1][4])[0]}
    assert pa.keys() == pb.keys() and pa
    for k in pa:
        if k.endswith("'mean']"):
            np.testing.assert_allclose(pa[k], (1 + m) * pb[k],
                                       rtol=1e-3, atol=1e-6)
        elif k.endswith("'var']"):
            # residual slack: torch-unbiased var stores s*n/(n-1) with
            # n = elements per channel — n for per-view updates, 2n for
            # the union update, a ~1/n relative factor (here n >= 32)
            np.testing.assert_allclose(pa[k] - m**2, (1 + m) * (pb[k] - m),
                                       rtol=4e-2, atol=1e-5)


def test_batched_two_view_distinct_views_bounded_divergence():
    """With img1 != img2 the union statistics genuinely differ from the
    per-view ones (the documented BN-semantics change of the knob) —
    outputs stay finite and close at moderate view divergence, and the
    consistency loss remains comparable."""
    kw = dict(TINY, pretrained=False, cls_dropout=0.0)
    m_off = MODELS.build("final", batched_two_view=False, **kw)
    m_on = MODELS.build("final", batched_two_view=True, **kw)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    v = m_off.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x0)
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
    img2 = img1 + 0.1 * jnp.asarray(
        rng.normal(size=(2, H, W, 3)).astype(np.float32))
    c_gt = jnp.ones((2, H // 16, W // 16, 1), jnp.float32)
    res = []
    for m in (m_off, m_on):
        (dc1, dc2, c1, c2, c_err, l_con, l_err), _ = m.apply(
            v, img1, img2, c_gt, method=m.forward_train,
            rngs={"dropout": jax.random.PRNGKey(5)},
            mutable=["batch_stats"])
        assert bool(jnp.isfinite(dc1).all() and jnp.isfinite(l_con))
        res.append((np.asarray(c1), float(l_con)))
    # compare on CONTINUOUS quantities: the density outputs pass through
    # binarized cls/error masks, which flip whole blocks on any BN-stat
    # shift (same threshold chaos BENCH_NOTES documents for reduction-
    # order noise) — the pre-threshold classifier probabilities and the
    # consistency loss show the true size of the union-BN perturbation
    assert np.abs(res[0][0] - res[1][0]).max() < 0.1
    assert abs(res[0][1] - res[1][1]) <= 0.2 * max(res[0][1], 1e-8)
