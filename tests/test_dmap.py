"""Density-map generation parity tests.

Golden values come from scipy.ndimage.gaussian_filter applied to a delta
image — the exact op the reference uses (dmap_gen.py:72-79).
"""

import numpy as np
import pytest
import scipy.ndimage

from dgvcc_tpu.ops.dmap import (
    gaussian_density_adaptive_np,
    gaussian_density_fixed_np,
    gaussian_density_jax,
)


def scipy_density_fixed(shape, points, sigma=4.0):
    h, w = shape
    density = np.zeros(shape, dtype=np.float32)
    for pt in points:
        if int(pt[1]) < h and int(pt[0]) < w and int(pt[1]) >= 0 and int(pt[0]) >= 0:
            delta = np.zeros(shape, dtype=np.float32)
            delta[int(pt[1]), int(pt[0])] = 1.0
            density += scipy.ndimage.gaussian_filter(
                delta, sigma, truncate=7 / sigma, mode="constant"
            )
    return density


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_fixed_np_matches_scipy(rng):
    shape = (96, 128)
    points = rng.uniform(0, [128, 96], size=(25, 2))
    ours = gaussian_density_fixed_np(shape, points)
    golden = scipy_density_fixed(shape, points)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)
    # total mass = number of in-bounds points minus boundary-lost mass
    assert ours.sum() == pytest.approx(golden.sum(), rel=1e-4)


def test_fixed_np_boundary_clipping(rng):
    # points near edges lose mass (mode='constant'), out-of-bounds skipped
    shape = (64, 64)
    points = np.array([[0.0, 0.0], [63.9, 63.9], [70.0, 10.0], [-1.0, 5.0]])
    ours = gaussian_density_fixed_np(shape, points)
    golden = scipy_density_fixed(shape, points)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)
    assert ours.sum() < 2.0  # corner points lose mass; 2 points skipped


def test_fixed_np_empty():
    out = gaussian_density_fixed_np((32, 32), np.empty((0, 2)))
    assert out.shape == (32, 32) and out.sum() == 0


def test_jax_matches_np(rng):
    shape = (96, 128)
    n = 25
    points = rng.uniform(0, [128, 96], size=(n, 2)).astype(np.float32)
    golden = gaussian_density_fixed_np(shape, points)
    # padded + masked invocation, as the jit path requires static shapes
    pad = np.zeros((40, 2), np.float32)
    pad[:n] = points
    mask = np.zeros(40, bool)
    mask[:n] = True
    ours = np.asarray(gaussian_density_jax(pad, mask, shape[0], shape[1]))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_jax_mask_excludes_padding(rng):
    shape = (64, 64)
    pts = np.array([[10.0, 10.0], [50.0, 50.0]], np.float32)
    mask = np.array([True, False])
    out = np.asarray(gaussian_density_jax(pts, mask, 64, 64))
    assert out.sum() == pytest.approx(1.0, rel=1e-4)
    assert out[50, 50] == 0.0


def test_adaptive_np_matches_scipy_formula(rng):
    # >3 points: sigma_i from 3-NN distances; verify against direct scipy
    shape = (80, 80)
    points = rng.uniform(5, 75, size=(8, 2))
    from scipy.spatial import KDTree

    tree = KDTree(points.copy(), leafsize=2048)
    distances, _ = tree.query(points, k=4)
    golden = np.zeros(shape, dtype=np.float32)
    for i, pt in enumerate(points):
        delta = np.zeros(shape, dtype=np.float32)
        delta[int(pt[1]), int(pt[0])] = 1.0
        sigma = (distances[i][1] + distances[i][2] + distances[i][3]) * 0.1
        golden += scipy.ndimage.gaussian_filter(delta, sigma, mode="constant")
    ours = gaussian_density_adaptive_np(shape, points)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)


def test_adaptive_np_few_points():
    # <=3 points: sigma=15 fixed
    shape = (64, 64)
    points = np.array([[32.0, 32.0]])
    ours = gaussian_density_adaptive_np(shape, points)
    delta = np.zeros(shape, dtype=np.float32)
    delta[32, 32] = 1.0
    golden = scipy.ndimage.gaussian_filter(delta, 15.0, mode="constant")
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)


def test_memory_attention_fused_matches_einsum():
    """Pallas fused prototype attention == einsum reference (interpret
    mode on CPU; the same kernel runs compiled on TPU)."""
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.ops.mem_attention import (
        memory_attention_fused,
        memory_attention_reference,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 300, 64)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    ours = np.asarray(memory_attention_fused(y, mem, tile=128, interpret=True))
    golden = np.asarray(memory_attention_reference(y, mem))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)
