"""On-device (XLA-compiled) augmentation pipeline.

The reference does all augmentation per-sample in DataLoader worker
processes (PIL ops, datasets/den_cls_dataset.py:77-158). Host decode
stays on CPU, but everything after can run batched on the TPU: this
module implements the den_cls train transform — random crop (image +
density map in lockstep), horizontal flip, greyscale p=0.12, and the
second view's photometric stack (color jitter p=0.8, 3x3 gaussian blur
p=0.5, sharpness p=0.5) — as ONE jitted program over uint8 batches.

Distribution parity with data/transforms.py (same probabilities and
factor laws); bit parity is not expected (different RNG). Use
``augment_two_view_batch`` from an input pipeline that ships raw
decoded crops+dmaps to the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GREY_W = jnp.array([0.299, 0.587, 0.114])  # PIL 'L' weights


def _rand(rng):
    return jax.random.uniform(rng, ())


def rgb_to_grey3(x):
    g = jnp.tensordot(x, GREY_W, axes=[[-1], [0]])
    return jnp.repeat(g[..., None], 3, axis=-1)


def adjust_brightness(x, f):
    return x * f


def adjust_contrast(x, f):
    # torchvision: blend with the mean of the greyscale image
    mean = jnp.mean(jnp.tensordot(x, GREY_W, axes=[[-1], [0]]), axis=(-2, -1),
                    keepdims=True)[..., None]
    return mean + (x - mean) * f


def adjust_saturation(x, f):
    g = rgb_to_grey3(x)
    return g + (x - g) * f


def adjust_hue(x, f):
    """Approximate hue rotation in YIQ space (cheap, fully fused)."""
    theta = f * 2.0 * jnp.pi
    cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
    # RGB→YIQ→rotate IQ→RGB, constants folded
    t_yiq = jnp.array([[0.299, 0.587, 0.114],
                       [0.596, -0.274, -0.322],
                       [0.211, -0.523, 0.312]])
    t_rgb = jnp.array([[1.0, 0.956, 0.621],
                       [1.0, -0.272, -0.647],
                       [1.0, -1.106, 1.703]])
    rot = jnp.array([[1.0, 0.0, 0.0],
                     [0.0, cos_h, -sin_h],
                     [0.0, sin_h, cos_h]])
    m = t_rgb @ rot @ t_yiq
    return jnp.clip(jnp.einsum("...c,dc->...d", x, m), 0.0, 1.0)


def gaussian_blur3(x, sigma: float = 1.0):
    k = jnp.exp(-0.5 * (jnp.array([-1.0, 0.0, 1.0]) / sigma) ** 2)
    k = k / k.sum()
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)), mode="reflect")
    x = k[0] * xp[:-2] + k[1] * xp[1:-1] + k[2] * xp[2:]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    return k[0] * xp[:, :-2] + k[1] * xp[:, 1:-1] + k[2] * xp[:, 2:]


def adjust_sharpness(x, f: float = 5.0):
    """torchvision adjust_sharpness: blend with a 3x3 smoothed image."""
    smooth = gaussian_blur3(x, sigma=0.85)
    return jnp.clip(smooth + (x - smooth) * f, 0.0, 1.0)


def photometric_view(img, rng):
    """The den_cls 'more_transform' stack, one image (H, W, 3) in [0,1]."""
    r = jax.random.split(rng, 8)
    do_jitter = _rand(r[0]) < 0.8

    def jitter(x):
        fb = jax.random.uniform(r[1], (), minval=0.5, maxval=1.5)
        fc = jax.random.uniform(r[2], (), minval=0.8, maxval=1.2)
        fs = jax.random.uniform(r[3], (), minval=0.8, maxval=1.2)
        fh = jax.random.uniform(r[4], (), minval=-0.1, maxval=0.1)
        x = adjust_brightness(x, fb)
        x = adjust_contrast(x, fc)
        x = adjust_saturation(x, fs)
        x = adjust_hue(x, fh)
        return jnp.clip(x, 0.0, 1.0)

    img = jnp.where(do_jitter, jitter(img), img)
    img = jnp.where(_rand(r[5]) < 0.5, gaussian_blur3(img, 1.0), img)
    img = jnp.where(_rand(r[6]) < 0.5, adjust_sharpness(img, 5.0), img)
    return img


def _geometric(img, dmap, rng, crop: int):
    """Shared-geometry random crop + flip for (img, dmap)."""
    h, w, _ = img.shape
    r = jax.random.split(rng, 3)
    i = jax.random.randint(r[0], (), 0, max(h - crop, 0) + 1)
    j = jax.random.randint(r[1], (), 0, max(w - crop, 0) + 1)
    img_c = jax.lax.dynamic_slice(img, (i, j, 0), (crop, crop, 3))
    d_c = jax.lax.dynamic_slice(dmap, (i, j, 0), (crop, crop, 1))
    flip = _rand(r[2]) < 0.5
    img_c = jnp.where(flip, img_c[:, ::-1], img_c)
    d_c = jnp.where(flip, d_c[:, ::-1], d_c)
    return img_c, d_c


@functools.partial(jax.jit, static_argnames=("crop", "block"))
def augment_two_view_batch(frames_u8, dmaps, rng, crop: int = 320,
                           block: int = 16):
    """Batched den_cls train transform, fully on device.

    frames_u8: (B, H, W, 3) uint8 decoded frames (H, W >= crop)
    dmaps:     (B, H, W, 1) float32 density maps
    Returns dict(img1, img2, dmap, bmap) with the reference's semantics
    (grey p=0.12 shared by both views; photometric stack on view 2;
    bmap = 16x16 block-sum > 0).
    """
    b = frames_u8.shape[0]
    imgs = frames_u8.astype(jnp.float32) / 255.0
    rngs = jax.random.split(rng, b)

    def per_sample(img, dmap, r):
        r = jax.random.split(r, 4)
        img, dmap = _geometric(img, dmap, r[0], crop)
        grey = _rand(r[1]) < 0.12
        img = jnp.where(grey, rgb_to_grey3(img), img)
        img2 = photometric_view(img, r[2])
        norm = lambda x: (x - 0.5) / 0.5
        return norm(img), norm(img2), dmap

    img1, img2, dmap = jax.vmap(per_sample)(imgs, dmaps, rngs)
    bh, bw = crop // block, crop // block
    blocks = dmap[..., 0].reshape(b, bh, block, bw, block).sum(axis=(2, 4))
    bmap = (blocks > 0).astype(jnp.float32)[..., None]
    return {"img1": img1, "img2": img2, "dmap": dmap, "bmap": bmap}
