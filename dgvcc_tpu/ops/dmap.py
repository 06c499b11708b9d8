"""Gaussian density-map generation.

The reference (/root/reference/utils/dmap_gen.py:53-81) builds a density
map by looping over head points, placing a delta at ``(int(y), int(x))``
and running ``scipy.ndimage.gaussian_filter(sigma=4, truncate=7/sigma,
mode='constant')`` — i.e. splatting a truncated, separably-normalized
Gaussian kernel per point, with out-of-image mass lost.

TPU-native formulation: a truncated Gaussian splat is separable *per
point*, so with per-point 1-D kernels stacked as columns,

    density[h, w] = sum_i ky_i[h] * kx_i[w]  =  (A @ B)[h, w]

where ``A[h, i] = k1d(h - y_i; sigma_i)`` (H x N) and
``B[i, w] = k1d(w - x_i; sigma_i)`` (N x W). The entire scatter becomes
one MXU matmul plus two broadcasted exps — no data-dependent control
flow, no scatter, jit-able with static shapes (points padded + masked).

Three implementations:
  * ``gaussian_density_fixed_np`` / ``gaussian_density_adaptive_np`` —
    numpy golden references matching scipy bit-for-bit in formula
    (used by the offline tool and unit tests);
  * ``gaussian_density_jax`` — jnp separable-matmul, jit-able;
  * ``gaussian_density_pallas`` — fused Pallas kernel that builds A/B
    tiles in VMEM and accumulates the matmul without materializing
    A/B in HBM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1-D truncated kernels (scipy-compatible)
# ---------------------------------------------------------------------------

def _kernel_1d_np(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage _gaussian_kernel1d: exp(-0.5 (x/sigma)^2), normalized."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return (phi / phi.sum()).astype(np.float64)


def scipy_radius(sigma: float, truncate: float) -> int:
    """scipy.ndimage.gaussian_filter radius: int(truncate * sigma + 0.5)."""
    return int(truncate * float(sigma) + 0.5)


# ---------------------------------------------------------------------------
# numpy golden implementations
# ---------------------------------------------------------------------------

def _splat_np(shape, points_int, sigmas, truncates) -> np.ndarray:
    h, w = shape
    density = np.zeros((h, w), dtype=np.float64)
    for (px, py), sigma, truncate in zip(points_int, sigmas, truncates):
        if not (0 <= py < h and 0 <= px < w):
            continue  # reference skips out-of-bounds points (dmap_gen.py:74-76)
        r = scipy_radius(sigma, truncate)
        k = _kernel_1d_np(sigma, r)
        y0, y1 = py - r, py + r + 1
        x0, x1 = px - r, px + r + 1
        ky = k[max(0, -y0) : 2 * r + 1 - max(0, y1 - h)]
        kx = k[max(0, -x0) : 2 * r + 1 - max(0, x1 - w)]
        density[max(0, y0) : min(h, y1), max(0, x0) : min(w, x1)] += np.outer(ky, kx)
    return density.astype(np.float32)


def gaussian_density_fixed_np(shape, points: np.ndarray, sigma: float = 4.0) -> np.ndarray:
    """Fixed-sigma density map; parity with dmap_gen.gaussian_filter_density_fixed.

    ``points`` are (N, 2) in (x, y) = (col, row) order; coordinates are
    int-cast exactly like the reference (dmap_gen.py:74-75). truncate =
    7 / sigma (dmap_gen.py:79), i.e. radius 7 for sigma=4.
    """
    points = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(points) == 0:
        return np.zeros(shape, dtype=np.float32)
    pts_int = points.astype(np.int64)
    n = len(points)
    return _splat_np(shape, pts_int, [sigma] * n, [7.0 / sigma] * n)


def gaussian_density_adaptive_np(shape, points: np.ndarray) -> np.ndarray:
    """Adaptive-sigma (kNN) density; parity with dmap_gen.gaussian_filter_density.

    sigma_i = 0.1 * (d1 + d2 + d3) of the 3 nearest neighbours when there
    are >3 points, else 15 (dmap_gen.py:45-48); scipy default truncate=4.
    """
    from scipy.spatial import KDTree

    points = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(points) == 0:
        return np.zeros(shape, dtype=np.float32)
    if len(points) > 3:
        tree = KDTree(points.copy(), leafsize=2048)
        distances, _ = tree.query(points, k=4)
        sigmas = (distances[:, 1] + distances[:, 2] + distances[:, 3]) * 0.1
    else:
        sigmas = np.full(len(points), 15.0)
    pts_int = points.astype(np.int64)
    return _splat_np(shape, pts_int, sigmas, [4.0] * len(points))


# ---------------------------------------------------------------------------
# JAX separable-matmul implementation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("height", "width", "sigma", "truncate"))
def gaussian_density_jax(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    height: int,
    width: int,
    sigma: float = 4.0,
    truncate: float = 7.0 / 4.0,
) -> jnp.ndarray:
    """Density map from padded points as one matmul.

    Args:
        points: (N, 2) float array, (x, y) order; pad rows arbitrarily.
        mask:   (N,) bool/float validity of each row.
        height, width: static output shape.

    Returns (height, width) float32 density. Matches the numpy golden
    implementation to float32 tolerance (same truncation radius,
    normalization, int-cast and out-of-bounds-skip semantics).
    """
    r = scipy_radius(sigma, truncate)
    # int() truncates toward zero (so -0.4 → 0, kept at column 0) — match
    # the reference/golden exactly; floor would drop (-1, 0) coords
    pts = jnp.trunc(points).astype(jnp.int32)
    px, py = pts[:, 0], pts[:, 1]
    valid = (
        mask.astype(bool)
        & (py >= 0)
        & (py < height)
        & (px >= 0)
        & (px < width)
    )

    # 1-D normalized kernel values at every (pixel, point) offset.
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (offs / sigma) ** 2)
    k1d = k1d / k1d.sum()

    def axis_kernel(size, centers):
        # (size, N): k1d[coord - center + r] where |coord-center|<=r else 0
        coords = jnp.arange(size, dtype=jnp.int32)[:, None]
        d = coords - centers[None, :]
        inside = jnp.abs(d) <= r
        idx = jnp.clip(d + r, 0, 2 * r)
        return jnp.where(inside, k1d[idx], 0.0)

    a = axis_kernel(height, py) * valid[None, :].astype(jnp.float32)  # (H, N)
    b = axis_kernel(width, px)  # (N, W) after transpose
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Fused Pallas kernel
# ---------------------------------------------------------------------------

def _dmap_kernel(px_ref, py_ref, valid_ref, out_ref, *, sigma, radius, tile_h, tile_w, n_pts):
    """Compute one (tile_h, tile_w) output tile: A_tile @ B_tile.

    A_tile (tile_h, N) and B_tile (tile_w, N) are built in VMEM from the
    point coordinates; the product runs on the MXU. Nothing but the
    (H, W) output ever touches HBM. The 1-D kernel value is recomputed
    from the offset (one exp on the VPU) instead of gathered from a
    lookup table — gathers are the slow path on TPU, exps are not.
    """
    import jax.experimental.pallas as pl  # keep module import light

    ti = pl.program_id(0)
    tj = pl.program_id(1)

    # scipy's normalizer: sum of the truncated, *unnormalized* kernel.
    # radius/sigma are static, so this folds to a Python float constant.
    norm = float(sum(math.exp(-0.5 * (o / sigma) ** 2) for o in range(-radius, radius + 1)))

    def axis_tile(base, size, centers, extra_valid):
        coords = base + jax.lax.broadcasted_iota(jnp.int32, (size, n_pts), 0)
        d = (coords - centers[None, :]).astype(jnp.float32)
        inside = jnp.abs(d) <= radius
        vals = jnp.exp(-0.5 * (d / sigma) ** 2) / norm
        return jnp.where(inside & extra_valid[None, :], vals, 0.0)

    px = px_ref[0, :]
    py = py_ref[0, :]
    valid = valid_ref[0, :] > 0

    a = axis_tile(ti * tile_h, tile_h, py, valid)  # (tile_h, N)
    b = axis_tile(tj * tile_w, tile_w, px, jnp.ones_like(valid))  # (tile_w, N)
    out_ref[:, :] = jnp.dot(a, b.T, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "sigma", "truncate", "tile")
)
def gaussian_density_pallas(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    height: int,
    width: int,
    sigma: float = 4.0,
    truncate: float = 7.0 / 4.0,
    tile: int = 256,
) -> jnp.ndarray:
    """Fused Pallas splat: builds kernel tiles in VMEM, matmuls on MXU.

    Same semantics as :func:`gaussian_density_jax`. Points are padded to a
    lane multiple internally.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = scipy_radius(sigma, truncate)
    n = points.shape[0]
    n_pad = max(128, int(math.ceil(n / 128)) * 128)

    pts = jnp.trunc(points).astype(jnp.int32)  # int()-cast parity, see above
    px = jnp.full((1, n_pad), -10_000, jnp.int32).at[0, :n].set(pts[:, 0])
    py = jnp.full((1, n_pad), -10_000, jnp.int32).at[0, :n].set(pts[:, 1])
    valid = (
        mask.astype(bool)
        & (pts[:, 1] >= 0)
        & (pts[:, 1] < height)
        & (pts[:, 0] >= 0)
        & (pts[:, 0] < width)
    )
    vmask = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(valid.astype(jnp.int32))

    h_pad = int(math.ceil(height / tile)) * tile
    w_pad = int(math.ceil(width / tile)) * tile
    grid = (h_pad // tile, w_pad // tile)

    kernel = functools.partial(
        _dmap_kernel, sigma=float(sigma), radius=r, tile_h=tile, tile_w=tile, n_pts=n_pad
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(px, py, vmask)
    return out[:height, :width]
