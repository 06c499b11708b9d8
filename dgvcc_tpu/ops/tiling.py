"""Arbitrary-size evaluation via static-shape patch tiling.

The reference slices full-resolution val/test images into patch_size
chunks with Python loops and variable tail shapes
(/root/reference/utils/misc.py:47-67, trainers/dgtrainer.py:71-84) —
every distinct image size would trigger an XLA recompile. TPU-native
re-design:

  1. pad the (already unit_size-padded) image UP to a multiple of the
     tile size with black pixels (the normalized value of 0-intensity),
  2. reshape into a (T, ps, ps, 3) tile batch — one static shape,
  3. run the model over tiles (batched; tile count bucketed to limit
     compile variants),
  4. mask out density predicted on OUR extra padding (the reference's
     own unit_size padding stays unmasked for metric parity) and sum.

Compile count is bounded by the number of tile-count buckets, not by
the number of distinct image sizes.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# value of a black pixel after Normalize(mean=0.5, std=0.5)
BLACK = -1.0


def _bucket(n: int, buckets=(1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(math.ceil(n / 16)) * 16


def tile_image(img: np.ndarray, patch_size: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """img (H, W, 3) → (T_bucket, ps, ps, 3) tiles + per-tile pixel masks.

    Returns (tiles, masks, nh, nw). masks are (T_bucket, ps, ps, 1)
    with 1 where the pixel came from the real image.
    """
    h, w, c = img.shape
    ps = patch_size
    nh, nw = math.ceil(h / ps), math.ceil(w / ps)
    ph, pw = nh * ps, nw * ps
    padded = np.full((ph, pw, c), BLACK, img.dtype)
    padded[:h, :w] = img
    mask = np.zeros((ph, pw, 1), np.float32)
    mask[:h, :w] = 1.0

    tiles = padded.reshape(nh, ps, nw, ps, c).transpose(0, 2, 1, 3, 4).reshape(-1, ps, ps, c)
    masks = mask.reshape(nh, ps, nw, ps, 1).transpose(0, 2, 1, 3, 4).reshape(-1, ps, ps, 1)

    t = tiles.shape[0]
    tb = _bucket(t)
    if tb > t:
        tiles = np.concatenate([tiles, np.full((tb - t, ps, ps, c), BLACK, img.dtype)])
        masks = np.concatenate([masks, np.zeros((tb - t, ps, ps, 1), np.float32)])
    return tiles, masks, nh, nw


def pool_mask_to(masks: jnp.ndarray, d_shape) -> jnp.ndarray:
    """Pool a full-res pixel mask to a model's density grid. Models may
    predict at a coarser stride (CSRNet 1/8, MCNN 1/4 ...); each density
    cell is weighted by its real-pixel fraction. Shared by the
    single-device and mesh-sharded counters so the two cannot drift."""
    if masks.shape[1] == d_shape[1]:
        return masks
    n, mh, mw, _ = masks.shape
    f = mh // d_shape[1]
    return masks.reshape(n, d_shape[1], f, d_shape[2], f, 1).mean(axis=(2, 4))


class TiledCounter:
    """Patch-tiled density counting with a bounded compile set.

    apply_fn(variables, tile_batch) must return the density map (or a
    tuple whose first element is the density map) at full tile
    resolution. Counts are masked sums / log_para.
    """

    def __init__(self, apply_fn: Callable, log_para: float, patch_size: int,
                 bucket: int = 128):
        self.log_para = log_para
        self.patch_size = patch_size
        self.bucket = bucket  # whole-image mode pads H,W to this multiple

        @jax.jit
        def _count(variables, tiles, masks):
            out = apply_fn(variables, tiles)
            d = out[0] if isinstance(out, tuple) else out
            d = d.astype(jnp.float32)
            masks = pool_mask_to(masks, d.shape)
            return jnp.sum(d * masks) / log_para

        @jax.jit
        def _dmap(variables, tiles):
            out = apply_fn(variables, tiles)
            return (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)

        self._count = _count
        self._dmap = _dmap

    def _whole_image(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Pad H,W to bucket multiples (static-shape whole-image path)."""
        h, w, c = img.shape
        bh = math.ceil(h / self.bucket) * self.bucket
        bw = math.ceil(w / self.bucket) * self.bucket
        padded = np.full((bh, bw, c), BLACK, img.dtype)
        padded[:h, :w] = img
        mask = np.zeros((bh, bw, 1), np.float32)
        mask[:h, :w] = 1.0
        return padded[None], mask[None]

    def count(self, variables, img: np.ndarray) -> float:
        """Predicted count for one (H, W, 3) image (dgtrainer.py:71-84)."""
        h, w, _ = img.shape
        ps = self.patch_size
        if h >= ps or w >= ps:
            tiles, masks, _, _ = tile_image(img, ps)
            return float(self._count(variables, jnp.asarray(tiles), jnp.asarray(masks)))
        tiles, masks = self._whole_image(img)
        return float(self._count(variables, jnp.asarray(tiles), jnp.asarray(masks)))

    def density_map(self, variables, img: np.ndarray) -> np.ndarray:
        """Stitched density map (dgtrainer.py:104-120).

        Models that predict at a coarser stride (CSRNet 1/8, MCNN 1/4)
        return a map at that stride — mass-correct, f-times smaller; the
        full-res crop indices are scaled accordingly.
        """
        h, w, _ = img.shape
        ps = self.patch_size
        if h >= ps or w >= ps:
            tiles, masks, nh, nw = tile_image(img, ps)
            d = np.asarray(self._dmap(variables, jnp.asarray(tiles)))
            f = ps // d.shape[1]  # output stride of the model
            psd = ps // f
            d = d[: nh * nw].reshape(nh, nw, psd, psd, 1).transpose(0, 2, 1, 3, 4)
            d = d.reshape(nh * psd, nw * psd, 1)
            return d[: h // f, : w // f, 0]
        tiles, masks = self._whole_image(img)
        d = np.asarray(self._dmap(variables, jnp.asarray(tiles)))[0]
        f = tiles.shape[1] // d.shape[0]
        return d[: h // f, : w // f, 0]
