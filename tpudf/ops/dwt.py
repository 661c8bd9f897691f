"""Haar (db1) 2-D discrete wavelet transform as reshape arithmetic.

The reference uses PyWavelets (C) for db1 2-level DWT energies inside the
24-d frequency features (appv3.py:1688-1693) and for wavelet forensic scores.
db1 on even-length signals is exactly a non-overlapping 2x2 block transform,
which on TPU is pure reshape+add — no convolution needed.

Convention matches pywt.dwt2: returns (cA, (cH, cV, cD)) where cH carries the
detail along the row axis (pywt _multidim.py maps 'da'→cH, 'ad'→cV). Signs
are energy-equivalent to pywt.
"""

from __future__ import annotations

import jax.numpy as jnp

_INV_SQRT2 = 2.0 ** -0.5


def haar_dwt2(x):
    """x: (..., H, W) with even H, W → (cA, (cH, cV, cD)), each (..., H/2, W/2)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    a = x[..., 0, :, 0]
    b = x[..., 0, :, 1]
    c = x[..., 1, :, 0]
    d = x[..., 1, :, 1]
    ca = (a + b + c + d) * 0.5
    ch = (c + d - a - b) * 0.5      # detail along rows (axis -2)
    cv = (b + d - a - c) * 0.5      # detail along cols (axis -1)
    cd = (a + d - b - c) * 0.5
    return ca, (ch, cv, cd)


def haar_energies_2level(x):
    """Mean |coeff|^2 of [cA1,cH1,cV1,cD1,cA2,cH2,cV2,cD2]
    (appv3.py:1688-1693). x: (..., H, W) → (..., 8)."""
    ca1, (ch1, cv1, cd1) = haar_dwt2(x)
    ca2, (ch2, cv2, cd2) = haar_dwt2(ca1)
    bands = [ca1, ch1, cv1, cd1, ca2, ch2, cv2, cd2]
    return jnp.stack(
        [jnp.mean(b ** 2, axis=(-2, -1)) for b in bands], axis=-1)
