"""Device-side training augmentation (the Kornia-GPU-pipeline equivalent).

The reference augments on GPU with Kornia (hidf_video_classifier.py:2864-2891,
cifake_binary_classifier.py:1766-1805, siglip2siddataset.py:806-861) plus a
host-side "ultra JPEG" recompression transform (cifake :86-110). Here every
transform is a pure function of an explicit PRNG key, fused into the jitted
input graph: flips, rotation, color jitter, gaussian blur/noise, JPEG
simulation (8x8 DCT quantization — the device analogue of recompression),
and CLAHE-style local contrast.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpudf.ops.dct import dct2_8x8, idct2_8x8, JPEG_LUMA_Q


def random_hflip(rng, x, p=0.5):
    """(B, H, W, C); per-sample flip."""
    flip = jax.random.bernoulli(rng, p, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], jnp.flip(x, axis=2), x)


def random_vflip(rng, x, p=0.5):
    flip = jax.random.bernoulli(rng, p, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], jnp.flip(x, axis=1), x)


def random_rot90(rng, x, p=0.5):
    """Random 0/90/180/270 rotation (square inputs)."""
    k = jax.random.randint(rng, (x.shape[0],), 0, 4)
    rots = jnp.stack([x, jnp.rot90(x, 1, (1, 2)), jnp.rot90(x, 2, (1, 2)),
                      jnp.rot90(x, 3, (1, 2))], axis=1)
    return jnp.take_along_axis(
        rots, k[:, None, None, None, None], axis=1)[:, 0]


def random_brightness_contrast(rng, x, brightness=0.2, contrast=0.2):
    r1, r2 = jax.random.split(rng)
    b = x.shape[0]
    db = jax.random.uniform(r1, (b, 1, 1, 1), minval=-brightness,
                            maxval=brightness)
    dc = 1.0 + jax.random.uniform(r2, (b, 1, 1, 1), minval=-contrast,
                                  maxval=contrast)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * dc + mean + db, 0.0, 1.0)


def random_saturation(rng, x, sat=0.2):
    s = 1.0 + jax.random.uniform(rng, (x.shape[0], 1, 1, 1),
                                 minval=-sat, maxval=sat)
    gray = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.clip(gray + (x - gray) * s, 0.0, 1.0)


@functools.lru_cache(maxsize=8)
def _gauss_kernel_np(sigma: float, radius: int):
    import numpy as np
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype("float32")


def _gauss_kernel(sigma: float, radius: int):
    return jnp.asarray(_gauss_kernel_np(sigma, radius))


def gaussian_blur(x, sigma=1.0, radius=2):
    """Separable gaussian blur, (B, H, W, C)."""
    k = _gauss_kernel(float(sigma), radius)
    x = jnp.moveaxis(x, -1, 1)                       # (B, C, H, W)
    b, c, h, w = x.shape
    xr = x.reshape(b * c, 1, h, w)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    pad = radius
    y = jax.lax.conv_general_dilated(xr, kh, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.moveaxis(y.reshape(b, c, h, w), 1, -1)


def random_gaussian_blur(rng, x, p=0.3, sigma=1.0):
    do = jax.random.bernoulli(rng, p, (x.shape[0],))
    return jnp.where(do[:, None, None, None], gaussian_blur(x, sigma), x)


def random_gaussian_noise(rng, x, p=0.3, std=0.02):
    r1, r2 = jax.random.split(rng)
    noise = jax.random.normal(r1, x.shape) * std
    do = jax.random.bernoulli(r2, p, (x.shape[0],))
    return jnp.clip(x + jnp.where(do[:, None, None, None], noise, 0.0), 0., 1.)


def jpeg_simulate(x, quality: int):
    """Differentiable JPEG-artifact simulation on device: luma-only 8x8 DCT →
    quantize with the standard luminance table scaled to `quality` → dequant →
    inverse DCT. The device analogue of the reference UltraJPEGTransform
    (cifake_binary_classifier.py:86-110, q5-25 recompression)."""
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = jnp.clip(jnp.floor((jnp.asarray(JPEG_LUMA_Q) * scale + 50.0)
                           / 100.0), 1, 255)
    h, w = x.shape[1], x.shape[2]
    q_full = jnp.tile(q, (h // 8, w // 8))[None, :, :, None]   # block layout
    y = x * 255.0 - 128.0
    coeffs = dct2_8x8(y)
    deq = jnp.round(coeffs / q_full) * q_full
    out = idct2_8x8(deq)
    return jnp.clip((out + 128.0) / 255.0, 0.0, 1.0)


def random_jpeg(rng, x, p=0.5, q_lo=5, q_hi=25, n_levels=5):
    """Random ultra-JPEG degradation; quality picked from a static ladder so
    shapes/tables stay compile-time constant."""
    r1, r2 = jax.random.split(rng)
    levels = [int(q_lo + i * (q_hi - q_lo) / (n_levels - 1))
              for i in range(n_levels)]
    variants = jnp.stack([jpeg_simulate(x, q) for q in levels], axis=1)
    pick = jax.random.randint(r1, (x.shape[0],), 0, n_levels)
    picked = jnp.take_along_axis(
        variants, pick[:, None, None, None, None], axis=1)[:, 0]
    do = jax.random.bernoulli(r2, p, (x.shape[0],))
    return jnp.where(do[:, None, None, None], picked, x)


def clahe_approx(x, clip=0.03, grid=8):
    """Device CLAHE approximation: per-tile mean/std local contrast
    normalization blended with the input (GPU-CLAHE analogue of
    siglip2siddataset.py:983-1048). Operates per channel."""
    b, h, w, c = x.shape
    th, tw = h // grid, w // grid
    tiles = x.reshape(b, grid, th, grid, tw, c)
    mu = jnp.mean(tiles, axis=(2, 4), keepdims=True)
    sd = jnp.std(tiles, axis=(2, 4), keepdims=True) + 1e-5
    normed = (tiles - mu) / sd
    normed = jnp.clip(normed, -2.5, 2.5)
    eq = normed * jnp.minimum(sd, clip * 2.5) + mu
    eq = eq.reshape(b, h, w, c)
    return jnp.clip(0.5 * x + 0.5 * eq, 0.0, 1.0)


def train_augment(rng, x, *, hflip=True, rot=False, jitter=True, blur=True,
                  noise=True, jpeg=False):
    """Composite training pipeline mirroring the reference Kornia stacks."""
    keys = iter(jax.random.split(rng, 8))
    if hflip:
        x = random_hflip(next(keys), x)
    if rot:
        x = random_rot90(next(keys), x)
    if jitter:
        x = random_brightness_contrast(next(keys), x)
        x = random_saturation(next(keys), x)
    if blur:
        x = random_gaussian_blur(next(keys), x)
    if noise:
        x = random_gaussian_noise(next(keys), x)
    if jpeg:
        x = random_jpeg(next(keys), x)
    return x
