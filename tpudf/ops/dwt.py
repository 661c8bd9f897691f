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

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT2 = 2.0 ** -0.5


def _on_tpu():
    from tpudf.core.backend import on_tpu
    return on_tpu()


@functools.lru_cache(maxsize=4)
def _haar_mat(n: int):
    """(n, n) f32 [pair-sum | pair-diff] analysis matrix: column j<n/2 sums
    rows (2j, 2j+1), column n/2+j differences them. X @ H transforms the
    last axis; Hᵀ from the left transforms rows. numpy (not jnp): lru_cached
    constants must not capture tracers/device buffers."""
    h = np.zeros((n, n), np.float32)
    for j in range(n // 2):
        h[2 * j, j] = 1.0
        h[2 * j + 1, j] = 1.0
        h[2 * j, n // 2 + j] = 1.0
        h[2 * j + 1, n // 2 + j] = -1.0
    return h


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


def _haar_quadrants_matmul(x):
    """One Haar level as TWO MXU matmuls: y = 0.5 * Hhᵀ X Hw, whose
    quadrants are (±)[cA | cV; cH | cD]. The reshape form's stride-2
    lane-axis slicing costs ~1 ms of relayouts per 256-image batch on the
    v5e; the separable-matmul form is ~7x faster (signs differ per band but
    energies are sign-invariant). bf16 operands, f32 accumulation."""
    *lead, h, w = x.shape
    # bf16 operands only where the MXU runs them natively; CPU/GPU twins
    # keep f32 (CPU XLA cannot execute BF16xBF16=F32 dots)
    mm = jnp.bfloat16 if _on_tpu() else jnp.float32
    hw = jnp.asarray(_haar_mat(w), mm)
    hh = jnp.asarray(_haar_mat(h), mm)
    t = jnp.einsum("...hw,wk->...hk", x.astype(mm), hw,
                   preferred_element_type=jnp.float32)
    y = 0.5 * jnp.einsum("...hk,hm->...mk", t.astype(mm), hh,
                         preferred_element_type=jnp.float32)
    ca = y[..., :h // 2, :w // 2]
    cv = y[..., :h // 2, w // 2:]
    ch = y[..., h // 2:, :w // 2]
    cd = y[..., h // 2:, w // 2:]
    return ca, ch, cv, cd


def haar_energies_2level(x, use_matmul=None):
    """Mean |coeff|^2 of [cA1,cH1,cV1,cD1,cA2,cH2,cV2,cD2]
    (appv3.py:1688-1693). x: (..., H, W) → (..., 8).

    On TPU the two levels run as separable Haar matmuls on the MXU
    (_haar_quadrants_matmul); elsewhere the exact f32 reshape form."""
    if use_matmul is None:
        use_matmul = _on_tpu()
    if use_matmul and x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0:
        ca1, ch1, cv1, cd1 = _haar_quadrants_matmul(x)
        ca2, ch2, cv2, cd2 = _haar_quadrants_matmul(ca1)
        bands = [ca1, ch1, cv1, cd1, ca2, ch2, cv2, cd2]
    else:
        ca1, (ch1, cv1, cd1) = haar_dwt2(x)
        ca2, (ch2, cv2, cd2) = haar_dwt2(ca1)
        bands = [ca1, ch1, cv1, cd1, ca2, ch2, cv2, cd2]
    return jnp.stack(
        [jnp.mean(b ** 2, axis=(-2, -1)) for b in bands], axis=-1)
