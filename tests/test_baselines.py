"""Classic baseline models: shape, stride, and output-contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvcc_tpu.core.registry import MODELS
import dgvcc_tpu.models  # noqa: F401

H = W = 64


def build_and_run(name, hw=(H, W), **params):
    model = MODELS.build(name, **params)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, *hw, 3)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x)
    return out


def test_csrnet_eighth_res():
    d = build_and_run("csrnet")
    assert d.shape == (1, H // 8, W // 8, 1)


def test_mcnn_quarter_res():
    d = build_and_run("mcnn")
    assert d.shape == (1, H // 4, W // 4, 1)


def test_bl_vgg_eighth_res_nonneg():
    d = build_and_run("bl")
    assert d.shape == (1, H // 8, W // 8, 1)
    assert bool((d >= 0).all())  # abs() output


def test_sasnet_full_res():
    d = build_and_run("sasnet", block_size=32)
    assert d.shape == (1, H, W, 1)
    assert bool(jnp.isfinite(d).all())


def test_dssinet_full_res():
    d = build_and_run("dssinet")
    assert d.shape == (1, H, W, 1)
    assert bool((d >= 0).all())  # final relu


def test_cctrans_eighth_res():
    # small geometry for test speed; window 4 divides 64/4=16 token grid
    d = build_and_run(
        "cctrans",
        embed_dims=(32, 64, 128, 256), num_heads=(2, 4, 8, 16),
        depths=(1, 1, 2, 1), wss=(4, 4, 4, 4), sr_ratios=(8, 4, 2, 1),
    )
    assert d.shape == (1, H // 8, W // 8, 1)
    assert bool((d >= 0).all())


def test_cctrans_window_padding():
    # 80/4=20 tokens, ws=7 does not divide 20 — pad+crop path must work
    d = build_and_run(
        "cctrans", hw=(80, 80),
        embed_dims=(32, 64, 128, 256), num_heads=(2, 4, 8, 16),
        depths=(1, 1, 1, 1), wss=(7, 7, 7, 7), sr_ratios=(8, 4, 2, 1),
    )
    assert d.shape == (1, 10, 10, 1)


def test_sasnet_non_divisible_size():
    """Adaptive pooling handles sizes not divisible by block_size at
    every stride (e.g. unit_size-16 padded val images)."""
    d = build_and_run("sasnet", hw=(96, 112), block_size=32)
    assert d.shape == (1, 96, 112, 1)
    assert bool(jnp.isfinite(d).all())


def test_cctrans_padding_mask_limits_leakage():
    """Border windows must not attend to padded tokens: an all-ones
    input at a non-divisible size should produce near-uniform density in
    the interior (no systematic border artifact from zero padding)."""
    model = MODELS.build(
        "cctrans",
        embed_dims=(32, 64, 128, 256), num_heads=(2, 4, 8, 16),
        depths=(1, 1, 1, 1), wss=(7, 7, 7, 7), sr_ratios=(8, 4, 2, 1),
    )
    x = jnp.ones((1, 80, 80, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    d = np.asarray(model.apply(variables, x))
    assert np.isfinite(d).all()
