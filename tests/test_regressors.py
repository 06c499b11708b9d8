"""Generator / DensityRegressor family shape + contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from dgvcc_tpu.core.registry import MODELS
import dgvcc_tpu.models  # noqa: F401

H = W = 64


def init_apply(name, *args, method=None, train=False, **params):
    model = MODELS.build(name, **params)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    kwargs = {}
    if method is not None:
        kwargs["method"] = getattr(model, method)
    if train or method == "forward_train":
        out, _ = model.apply(variables, *args, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)}, **kwargs)
    else:
        out = model.apply(variables, *args, **kwargs)
    return model, out


def test_generator_roundtrip_shape():
    x = jnp.ones((1, H, W, 3), jnp.float32)
    _, y = init_apply("gen", x)
    assert y.shape == (1, H, W, 3)
    assert bool((jnp.abs(y) <= 1).all())  # tanh


def test_generator0_shape():
    x = jnp.ones((1, H, W, 3), jnp.float32)
    _, y = init_apply("gen0", x)
    assert y.shape == (1, H, W, 3)


def test_dgnet_shape():
    x = jnp.ones((2, H, W, 3), jnp.float32)
    _, d = init_apply("dgnet", x)
    assert d.shape == (2, H, W, 1)


def test_dgnet_cls_shapes():
    x = jnp.ones((1, H, W, 3), jnp.float32)
    _, (dc, (d, c)) = init_apply("dgnet_cls", x)
    assert dc.shape == (1, H, W, 1)
    assert d.shape == (1, H // 4, W // 4, 1)
    assert c.shape == (1, H // 16, W // 16, 1)


def test_reg_shapes():
    x = jnp.ones((1, H, W, 3), jnp.float32)
    _, (dc, d, c, x3) = init_apply("reg", x)
    assert dc.shape == (1, H, W, 1)
    assert x3.shape == (1, H // 16, W // 16, 512)


def test_reg_mem_forward_and_train():
    x1 = jnp.ones((1, H, W, 3), jnp.float32)
    x2 = x1 * 0.5
    c_gt = jnp.zeros((1, H // 16, W // 16, 1), jnp.float32)
    model, (dc, c) = init_apply("reg_mem", x1)
    assert dc.shape == (1, H, W, 1) and c.shape == (1, H // 16, W // 16, 1)

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x1)
    out, _ = model.apply(variables, x1, x2, c_gt, method=model.forward_train,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(3)})
    dc1, dc2, c1, c2, loss_kl, loss_err = out
    assert dc1.shape == dc2.shape == (1, H, W, 1)
    assert float(loss_kl) >= 0 and np.isfinite(float(loss_kl))
    assert float(loss_err) >= 0


def test_true_jsd_matches_torch():
    from dgvcc_tpu.models.regressors import true_jsd

    rng = np.random.default_rng(0)
    # ours: (B, P=HW, S); torch reference: (B, S, HW) softmax dim=1
    l1 = rng.normal(size=(2, 12, 8)).astype(np.float32)
    l2 = rng.normal(size=(2, 12, 8)).astype(np.float32)
    ours = float(true_jsd(l1, l2))

    t1 = torch.tensor(l1).transpose(1, 2)  # (B, S, HW)
    t2 = torch.tensor(l2).transpose(1, 2)
    p1 = torch.softmax(t1, dim=1)
    p2 = torch.softmax(t2, dim=1)
    log_p1 = torch.log_softmax(t1, dim=1)
    log_p2 = torch.log_softmax(t2, dim=1)
    pm = (p1 + p2) / 2
    golden = float(0.5 / t1.shape[2] * (
        TF.kl_div(log_p1, pm, reduction="batchmean")
        + TF.kl_div(log_p2, pm, reduction="batchmean")))
    assert ours == pytest.approx(golden, rel=1e-4)
