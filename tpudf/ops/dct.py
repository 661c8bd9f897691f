"""8x8 block DCT-II/III as matmuls (MXU-friendly).

The reference uses scipy.fft.dct for JPEG-residual forensics
(appv3.py:2035-2149) — on TPU the blockwise 2-D DCT is two small matmuls per
8x8 tile, batched over all tiles.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

# standard JPEG luminance quantization table (Annex K) — kept as numpy so
# importing this module never initializes a JAX backend; jnp converts it
# per-trace at the use site (data/augment.py)
JPEG_LUMA_Q = (np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32))


@functools.lru_cache(maxsize=2)
def _dct_matrix_np(n: int = 8):
    d = np.zeros((n, n), np.float64)
    for k in range(n):
        for i in range(n):
            d[k, i] = math.cos(math.pi * (2 * i + 1) * k / (2 * n))
    d *= math.sqrt(2.0 / n)
    d[0] *= 1.0 / math.sqrt(2.0)
    return d.astype(np.float32)


def _dct_matrix(n: int = 8):
    """Orthonormal DCT-II matrix D: X = D x D^T for an n x n block.
    (numpy cached; converted per-trace to avoid leaking device constants)"""
    return jnp.asarray(_dct_matrix_np(n))


def _blocks(x, n=8):
    """(..., H, W[, C]) → (..., H/n, W/n, n, n) per channel-last layouts.
    Accepts (B,H,W) or (B,H,W,C)."""
    chan = x.ndim == 4
    if chan:
        x = jnp.moveaxis(x, -1, 1)            # (B, C, H, W)
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // n, n, w // n, n)
    x = jnp.swapaxes(x, -3, -2)               # (..., h/n, w/n, n, n)
    return x, chan


def _unblocks(x, chan):
    *lead, gh, gw, n, _ = x.shape
    x = jnp.swapaxes(x, -3, -2).reshape(*lead, gh * n, gw * n)
    if chan:
        x = jnp.moveaxis(x, 1, -1)
    return x


def dct2_8x8(x):
    """Blockwise 2-D DCT-II. x: (B,H,W) or (B,H,W,C) with H,W % 8 == 0.
    Returns same shape (coefficients laid out blockwise in place)."""
    d = _dct_matrix(8)
    bl, chan = _blocks(x, 8)
    out = jnp.einsum("ki,...ij,lj->...kl", d, bl, d)
    return _unblocks(out, chan)


def idct2_8x8(x):
    d = _dct_matrix(8)
    bl, chan = _blocks(x, 8)
    out = jnp.einsum("ik,...ij,jl->...kl", d, bl, d)
    return _unblocks(out, chan)


def blockwise_dct_energy(gray):
    """Per-block AC energy map: (B, H, W) → (B, H/8, W/8) mean |AC coeff| —
    building block for JPEG-residual forensics (appv3.py:2035-2063)."""
    d = _dct_matrix(8)
    bl, _ = _blocks(gray, 8)
    co = jnp.einsum("ki,...ij,lj->...kl", d, bl, d)
    ac = jnp.abs(co).sum((-2, -1)) - jnp.abs(co[..., 0, 0])
    return ac / 63.0
