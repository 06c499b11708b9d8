"""TorchBatchNorm parity vs torch.nn.BatchNorm2d.

flax's nn.BatchNorm updates the running variance with the BIASED batch
variance; torch stores the UNBIASED one (var * n/(n-1), ATen
batch_norm_update_stats). TorchBatchNorm reproduces torch exactly —
this caught a real eval-after-training divergence in the CCTrans
cross-framework A/B, whose Regression-head BNs see tiny n = B*H*W at
toy geometry (see scripts/ab_compare.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dgvcc_tpu.nn.layers import TorchBatchNorm


def test_torch_batchnorm_lockstep():
    rng = np.random.default_rng(0)
    tb = torch.nn.BatchNorm2d(5, momentum=0.1, eps=1e-5)
    with torch.no_grad():
        tb.weight.copy_(torch.tensor(rng.normal(1, 0.2, 5).astype(np.float32)))
        tb.bias.copy_(torch.tensor(rng.normal(0, 0.2, 5).astype(np.float32)))
    tb.train()
    m = TorchBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 5)))
    bs = v["batch_stats"]
    params = {"scale": jnp.asarray(tb.weight.detach().numpy().copy()),
              "bias": jnp.asarray(tb.bias.detach().numpy().copy())}

    for _ in range(4):
        x = rng.normal(0, 2, (2, 4, 4, 5)).astype(np.float32)
        ty = tb(torch.tensor(np.ascontiguousarray(
            np.transpose(x, (0, 3, 1, 2))))).detach().numpy()
        jy, nv = m.apply({"params": params, "batch_stats": bs},
                         jnp.asarray(x), mutable=["batch_stats"])
        bs = nv["batch_stats"]
        np.testing.assert_allclose(
            np.transpose(ty, (0, 2, 3, 1)), np.asarray(jy), atol=2e-6)
        # running stats track torch's UNBIASED variance update exactly
        np.testing.assert_allclose(tb.running_mean.detach().numpy(),
                                   np.asarray(bs["mean"]), atol=1e-6)
        np.testing.assert_allclose(tb.running_var.detach().numpy(),
                                   np.asarray(bs["var"]), atol=1e-6)

    tb.eval()
    x = rng.normal(0, 2, (1, 4, 4, 5)).astype(np.float32)
    ty = tb(torch.tensor(np.ascontiguousarray(
        np.transpose(x, (0, 3, 1, 2))))).detach().numpy()
    jy = TorchBatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(ty, (0, 2, 3, 1)), np.asarray(jy), atol=2e-6)


def test_torch_batchnorm_unbiased_vs_flax():
    """The one semantic difference from flax: running var carries the
    n/(n-1) correction. n = 2*3*3 = 18 here, so the gap is large enough
    to assert on directly."""
    from flax import linen as nn

    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 3, 3, 4))
                    .astype(np.float32))
    ours = TorchBatchNorm(use_running_average=False)
    fl = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vo = ours.init(jax.random.PRNGKey(0), x)
    vf = fl.init(jax.random.PRNGKey(0), x)
    yo, no = ours.apply(vo, x, mutable=["batch_stats"])
    yf, nf = fl.apply(vf, x, mutable=["batch_stats"])
    # identical normalized output (biased var both sides)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yf), atol=1e-6)
    ratio = (np.asarray(no["batch_stats"]["var"]) - 0.9) / \
            (np.asarray(nf["batch_stats"]["var"]) - 0.9)
    n = 2 * 3 * 3
    np.testing.assert_allclose(ratio, n / (n - 1), rtol=1e-5)
