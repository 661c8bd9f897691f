"""Block-wise forensic anomaly maps (localization heatmaps).

Batched JAX re-design of ultra_forensics.py:25-205 and the appv3 map battery
(appv3.py:2252-2464): PRNU strength / FFT-consistency maps, CFA anomaly,
JPEG recompression residual, patch variance, multiscale FFT, perlin noise
field, and the combined locator. Every map is (B, H/blk, W/blk) from one
jitted graph — the reference computes each with a Python double loop per
block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.data.augment import jpeg_simulate
from tpudf.ops.forensics import (_block_stats, extract_prnu, gaussian_blur,
                                 _conv3x3)

_SCHARR_X = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32)
_SCHARR_Y = _SCHARR_X.T


def _blocks(x, bs):
    b, h, w = x.shape
    t = x[:, :h - h % bs, :w - w % bs]
    return t.reshape(b, h // bs, bs, w // bs, bs)


def prnu_strength_map(gray, block=64):
    """Block mean |PRNU| (ultra_forensics.py:46-56)."""
    noise = extract_prnu(gray)
    return jnp.mean(jnp.abs(_blocks(noise, block)), axis=(2, 4))


def prnu_fft_consistency_map(gray, block=64):
    """Per-block radial FFT roughness of the PRNU field
    (ultra_forensics.py:59-73)."""
    noise = extract_prnu(gray)
    t = _blocks(noise, block)                     # (B, H, blk, W, blk)
    b, gh, _, gw, _ = t.shape
    tiles = t.transpose(0, 1, 3, 2, 4).reshape(b * gh * gw, block, block)
    from tpudf.ops.fft_features import fft2_mag
    mag = fft2_mag(tiles)
    radial = jnp.mean(mag, axis=1)                # (N, blk)
    smooth = _smooth1d(radial, 3.0)
    rough = jnp.mean(jnp.abs(radial - smooth), axis=1)
    return rough.reshape(b, gh, gw)


def _smooth1d(x, sigma):
    """1-D gaussian smoothing along the last axis of (N, L) (scipy reflect
    semantics, clamped so the pad never exceeds the signal length)."""
    from tpudf.ops.forensics import _gauss_kernel_np
    k_np, radius = _gauss_kernel_np(float(sigma))
    radius = min(radius, x.shape[-1] - 1)
    k = jnp.asarray(k_np[len(k_np) // 2 - radius:len(k_np) // 2 + radius + 1])
    k = k / jnp.sum(k)
    xp = jnp.pad(x, ((0, 0), (radius, radius)), mode="symmetric")
    return jax.lax.conv_general_dilated(
        xp[:, None, None, :], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0, 0]


def cfa_anomaly_map(gray, block=32):
    """Scharr-energy deviation per block (ultra_forensics.py:80-103)."""
    g255 = gray * 255.0
    e = jnp.abs(_conv3x3(g255, _SCHARR_X)) + jnp.abs(_conv3x3(g255, _SCHARR_Y))
    m = jnp.mean(_blocks(e, block), axis=(2, 4))
    return jnp.abs(m - jnp.mean(m, axis=(1, 2), keepdims=True))


def jpeg_residual_map(img, block=8, quality=95):
    """Recompression-residual block map (ultra_forensics.py:106-128);
    recompression via the device JPEG simulator."""
    rec = jpeg_simulate(img, quality)
    diff = jnp.abs(img - rec)
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("bhwc,c->bhw", diff, w)
    return jnp.mean(_blocks(gray, block), axis=(2, 4))


def patch_anomaly_map(gray, block=64):
    """Block variance deviation (ultra_forensics.py:135-148)."""
    m = _block_stats(gray * 255.0, block, "var")
    return jnp.abs(m - jnp.mean(m, axis=(1, 2), keepdims=True))


def multiscale_fft_map(gray, block=32):
    """Per-block mean FFT magnitude deviation (ultra_forensics.py:155-172)."""
    t = _blocks(gray * 255.0, block)
    b, gh, _, gw, _ = t.shape
    tiles = t.transpose(0, 1, 3, 2, 4).reshape(b * gh * gw, block, block)
    from tpudf.ops.fft_features import fft2_mag
    mag = fft2_mag(tiles)
    m = jnp.mean(mag, axis=(1, 2)).reshape(b, gh, gw)
    return jnp.abs(m - jnp.mean(m, axis=(1, 2), keepdims=True))


def perlin_noise_map(gray, block=32):
    """Residual-field variance deviation (ultra_forensics.py:179-194)."""
    noise = gray * 255.0 - gaussian_blur(gray * 255.0, 3.0)
    m = jnp.var(_blocks(noise, block), axis=(2, 4))
    return jnp.abs(m - jnp.mean(m, axis=(1, 2), keepdims=True))


def _norm01(m):
    lo = jnp.min(m, axis=(1, 2), keepdims=True)
    hi = jnp.max(m, axis=(1, 2), keepdims=True)
    return (m - lo) / (hi - lo + 1e-8)


def combined_anomaly_map(maps, size=None):
    """Mean of min-max-normalized maps (ultra_forensics.py:200-208);
    resamples each map to a common grid first (the reference's maps share
    block size; here they may differ)."""
    if size is None:
        size = max(m.shape[1] for m in maps)
    acc = None
    for m in maps:
        mn = _norm01(m)
        if mn.shape[1] != size:
            mn = jax.image.resize(mn, (mn.shape[0], size, size), "bilinear")
        acc = mn if acc is None else acc + mn
    return acc / len(maps)


def forensic_map_battery(img, gray=None):
    """All maps + combined locator for (B, H, W, 3) [0,1] input."""
    if gray is None:
        w = jnp.asarray([0.299, 0.587, 0.114])
        gray = jnp.einsum("bhwc,c->bhw", img, w)
    maps = {
        "prnu_strength": prnu_strength_map(gray),
        "prnu_fft": prnu_fft_consistency_map(gray),
        "cfa_anomaly": cfa_anomaly_map(gray),
        "jpeg_residual": jpeg_residual_map(img),
        "patch_variance": patch_anomaly_map(gray),
        "multiscale_fft": multiscale_fft_map(gray),
        "perlin": perlin_noise_map(gray),
    }
    maps["combined"] = combined_anomaly_map(
        [maps["prnu_strength"], maps["cfa_anomaly"], maps["patch_variance"],
         maps["multiscale_fft"], maps["perlin"]])
    return maps


def heatmap_overlay(image_rgb_uint8, anomaly_map, alpha=0.45):
    """Jet-colormap overlay (appv3.py:3425-3454 / ultra_forensics save_heatmap
    equivalent), host-side numpy → uint8 RGB."""
    m = np.asarray(anomaly_map, np.float32)
    m = (m - m.min()) / (m.max() - m.min() + 1e-8)
    h, w = image_rgb_uint8.shape[:2]
    m = np.asarray(jax.image.resize(jnp.asarray(m)[None], (1, h, w),
                                    "bilinear"))[0]
    # minimal jet: blue→cyan→yellow→red
    r = np.clip(1.5 - np.abs(4 * m - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * m - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * m - 1), 0, 1)
    heat = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    out = (image_rgb_uint8.astype(np.float32) * (1 - alpha)
           + heat.astype(np.float32) * alpha)
    return np.clip(out, 0, 255).astype(np.uint8)
