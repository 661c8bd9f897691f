"""SRM (steganalysis rich model) residual statistics.

The reference convolves grayscale with 3 fixed SRM high-pass kernels and takes
mean/var/kurtosis of each residual (appv3.py:1597-1615, 1712-1719) — 9 of the
24 frequency features. Here the convs run as one grouped XLA conv on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# appv3.py:1597-1615 kernel bank, each normalized by its |sum| at use site.
_K1 = np.array([[0, 0, 0, 0, 0],
                [0, -1, 2, -1, 0],
                [0, 2, -4, 2, 0],
                [0, -1, 2, -1, 0],
                [0, 0, 0, 0, 0]], np.float32)
_K2 = np.array([[-1, 2, -1],
                [2, -4, 2],
                [-1, 2, -1]], np.float32)
_K3 = np.array([[0, -1, 0],
                [-1, 4, -1],
                [0, -1, 0]], np.float32)

SRM_KERNELS = [_K1, _K2, _K3]
_EPS = 1e-6


def _norm(k):
    return k / (np.abs(k).sum() + _EPS)


def srm_residuals(gray):
    """gray: (B, H, W) → list of 3 residual maps (B, H, W) (zero-padded conv,
    'same' size)."""
    x = gray[:, None]                       # (B, 1, H, W)
    outs = []
    for k in SRM_KERNELS:
        kn = jnp.asarray(_norm(k))[None, None]
        pad = k.shape[-1] // 2
        y = jax.lax.conv_general_dilated(
            x, kn, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        outs.append(y[:, 0])
    return outs


def srm_features(gray):
    """(B, H, W) → (B, 9): per-kernel residual mean, var, kurtosis
    (appv3.py:1712-1719; kurtosis = E[(x-m)^4] / (var+eps)^2, biased)."""
    feats = []
    for y in srm_residuals(gray):
        flat = y.reshape(y.shape[0], -1)
        m = jnp.mean(flat, axis=1)
        v = jnp.var(flat, axis=1)
        k = jnp.mean((flat - m[:, None]) ** 4, axis=1) / ((v + _EPS) ** 2)
        feats += [m, v, k]
    return jnp.stack(feats, axis=-1)
