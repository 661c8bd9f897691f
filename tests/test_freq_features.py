"""Parity of the fused 24-d frequency feature graph vs a direct NumPy oracle
implementing the reference formulas (appv3.py:1634-1728)."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from tpudf.ops.dwt import haar_dwt2
from tpudf.ops.fft_features import extract_freq_vector, fft_features
from tpudf.ops.srm import SRM_KERNELS, srm_features


def _oracle_fft_feats(x):
    """x: (256,256) float32 [0,1]. Direct NumPy evaluation of the documented
    feature definitions (independent of the tpudf implementation)."""
    eps = 1e-6
    F = np.fft.fftshift(np.fft.fft2(x))
    mag = np.abs(F)
    phase = np.angle(F)
    h, w = mag.shape
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    rmax = r.max()
    r1, r2 = 0.15 * rmax, 0.45 * rmax
    Et = mag.sum() + eps
    El = mag[r <= r1].sum()
    Em = mag[(r > r1) & (r <= r2)].sum()
    Eh = mag[r > r2].sum()

    rb = np.logspace(np.log10(1.0), np.log10(rmax + 1.0), 40)
    ridx = np.searchsorted(rb, (r + 1.0).ravel(), side="left") - 1
    mu = []
    flat = np.log(mag.ravel() + 1e-6)
    for i in range(39):
        m = ridx == i
        mu.append(flat[m].mean() if m.any() else np.nan)
    slope = np.polyfit(np.arange(39), np.nan_to_num(mu), 1)[0]

    hist, _ = np.histogram(phase.ravel(), bins=50, range=(-math.pi, math.pi))
    prob = hist / (hist.sum() + eps)
    entropy = -(prob * np.log(prob + eps)).sum()

    ang = np.arctan2(yy - cy, xx - cx)
    sect = []
    for a0 in np.linspace(-math.pi, math.pi, 8, endpoint=False):
        m = (ang >= a0) & (ang < a0 + math.pi / 4)
        sect.append(mag[m].mean() if m.any() else 0.0)
    anis = np.var(sect)

    def dwt(a):
        p, q, s, t = a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2]
        return ((p + q + s + t) / 2, (s + t - p - q) / 2,
                (q + t - p - s) / 2, (p + t - q - s) / 2)

    ca1, ch1, cv1, cd1 = dwt(x)
    ca2, ch2, cv2, cd2 = dwt(ca1)
    wave = [np.mean(np.abs(c) ** 2)
            for c in [ca1, ch1, cv1, cd1, ca2, ch2, cv2, cd2]]
    return [El / Et, Em / Et, Eh / Et, (Eh + eps) / (El + eps),
            slope, anis, entropy] + wave


def _oracle_srm(x):
    from scipy.signal import convolve2d
    eps = 1e-6
    feats = []
    for k in SRM_KERNELS:
        kn = k / (np.abs(k).sum() + eps)
        y = convolve2d(x, kn[::-1, ::-1], mode="same")  # cross-correlation
        m, v = y.mean(), y.var()
        feats += [m, v, ((y - m) ** 4).mean() / ((v + eps) ** 2)]
    return feats


@pytest.fixture(scope="module")
def gray():
    rng = np.random.default_rng(0)
    base = rng.random((256, 256)).astype(np.float32)
    # add structure so spectra aren't flat
    yy, xx = np.mgrid[0:256, 0:256]
    return (0.5 * base + 0.5 * np.sin(xx / 9.0) * np.cos(yy / 17.0)
            ).astype(np.float32) * 0.5 + 0.25


def test_fft_features_match_oracle(gray):
    ours = np.asarray(fft_features(jnp.asarray(gray[None])))[0]
    oracle = np.asarray(_oracle_fft_feats(gray))
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_srm_features_match_oracle(gray):
    ours = np.asarray(srm_features(jnp.asarray(gray[None])))[0]
    oracle = np.asarray(_oracle_srm(gray))
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-4)


def test_extract_freq_vector_standardized(gray):
    v = np.asarray(extract_freq_vector(jnp.asarray(gray[None])))[0]
    assert v.shape == (24,)
    np.testing.assert_allclose(v.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(v.std(ddof=1), 1.0, atol=1e-3)


def test_haar_is_orthonormal(gray):
    ca, (ch, cv, cd) = haar_dwt2(jnp.asarray(gray[None]))
    energy_in = float(np.sum(gray ** 2))
    energy_out = float(sum(np.sum(np.asarray(c) ** 2)
                           for c in (ca, ch, cv, cd)))
    np.testing.assert_allclose(energy_in, energy_out, rtol=1e-5)


def test_srm_moments_pallas_kernel_parity(gray):
    """The fused SRM stencil+moments Pallas kernel (TPU path, run here in
    interpret mode) must match the XLA twin. Batch must be a multiple of
    the kernel's group (4) or srm_raw_moments falls back to the XLA form
    and the test compares the twin to itself (r3 review finding); assert
    the interpret path and the fallback path really differ in route by
    checking batch eligibility explicitly."""
    from tpudf.ops.srm import srm_raw_moments
    g = jnp.asarray(np.stack([gray, gray[::-1], gray.T, gray[:, ::-1]]))
    assert g.shape[0] % 4 == 0               # kernel-eligible batch
    a = np.asarray(srm_raw_moments(g, interpret=True))
    b = np.asarray(srm_raw_moments(g))
    # separable-vs-9-point stencil reassociation rounding ~5e-5 relative
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)


def test_haar_energies_matmul_path_parity(gray):
    """The TPU separable-matmul haar path (bf16 MXU) must track the exact
    f32 reshape form at feature level."""
    from tpudf.ops.dwt import haar_energies_2level
    g = jnp.asarray(np.stack([gray, gray.T]))
    a = np.asarray(haar_energies_2level(g, use_matmul=True))
    b = np.asarray(haar_energies_2level(g, use_matmul=False))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)


def test_matmul_dft_matches_fft_path():
    """The MXU DFT-by-matmul path (used on TPU) must match the jnp.fft path
    at feature level; also check raw re/im vs numpy fft in f32."""
    import jax.numpy as jnp
    from tpudf.ops.fft_features import (fft2_shifted_matmul, fft_features)

    rng = np.random.default_rng(11)
    gray = jnp.asarray(rng.random((3, 64, 64)), jnp.float32)

    re, im = fft2_shifted_matmul(gray, dtype=jnp.float32)
    ref = np.fft.fftshift(np.fft.fft2(np.asarray(gray)), axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-2)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-2)

    fa = np.asarray(fft_features(gray, use_matmul_dft=True))
    fb = np.asarray(fft_features(gray, use_matmul_dft=False))
    np.testing.assert_allclose(fa, fb, atol=5e-3, rtol=5e-3)


def test_matmul_dft_256_bf16_feature_parity():
    """The DEPLOYED TPU path — fft_features via the bf16 DFT-by-matmul at
    the real 256x256 input size (use_matmul_dft=True with the default bf16
    dtype) — must stay feature-level close to the f32 jnp.fft path. Guards
    the bf16 phase noise on small-magnitude coefficients, which hits the
    phase-entropy feature hardest (ADVICE r2 #5)."""
    rng = np.random.default_rng(5)
    # realistic-ish inputs: smooth image + noise, plus a pure-noise image
    yy, xx = np.mgrid[0:256, 0:256] / 256.0
    smooth = 0.5 + 0.3 * np.sin(7 * yy) * np.cos(11 * xx)
    imgs = np.stack([
        np.clip(smooth + 0.05 * rng.standard_normal((256, 256)), 0, 1),
        rng.random((256, 256)),
    ]).astype(np.float32)
    gray = jnp.asarray(imgs)
    fa = np.asarray(fft_features(gray, use_matmul_dft=True))
    fb = np.asarray(fft_features(gray, use_matmul_dft=False))
    # features are statistical aggregates; bf16 rounding must stay well
    # inside decision-irrelevant territory
    np.testing.assert_allclose(fa, fb, atol=0.06, rtol=0.05)
