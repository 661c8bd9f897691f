"""The 24-d FFT+SRM frequency feature extractor, as one fused device graph.

Reference: appv3.py:1634-1728 (`fft_features` + `srm_features` +
`extract_freq_vector`). The reference computes these per-image on host CPU
with NumPy/torch scalar loops — the #2 hot loop of image inference
(SURVEY.md §3.1). Here the whole battery is batched JAX:

  * all radial-band / log-bin / sector masks over the 256x256 FFT grid are
    STATIC (they depend only on image size), so per-region sums become one
    (B, H*W) @ (H*W, K) matmul on the MXU instead of 50 masked reductions;
  * the db1 wavelet energies are the Haar block transform (ops/dwt.py);
  * SRM stats are a grouped conv (ops/srm.py);
  * phase entropy is a 50-bin histogram via scatter-add.

Feature order (matches the reference exactly, appv3.py:1695-1705 + :1712-1719):
  [0]  E_low / E_total           (r <= 0.15 rmax)
  [1]  E_mid / E_total           (0.15 < r <= 0.45 rmax)
  [2]  E_high / E_total          (r > 0.45 rmax)
  [3]  (E_high+eps)/(E_low+eps)
  [4]  log-radial spectrum slope (39 log bins, least-squares line)
  [5]  8-sector anisotropy (variance of sector means)
  [6]  phase entropy (50-bin histogram)
  [7:15]  Haar energies [cA1,cH1,cV1,cD1,cA2,cH2,cV2,cD2]
  [15:24] SRM mean/var/kurtosis x 3 kernels
followed by per-vector standardization (appv3.py:1722-1728).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from tpudf.ops.dwt import haar_energies_2level
from tpudf.ops.srm import srm_features

_EPS = 1e-6


@functools.lru_cache(maxsize=4)
def _static_masks(h: int, w: int):
    """Precompute the mask matrix (H*W, 3+8) for band/sector sums, the
    (H*W, 39) log-bin matrix, bin counts, and polyfit weights — all numpy
    constants baked into the jitted graph."""
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    rmax = r.max()

    r1, r2 = 0.15 * rmax, 0.45 * rmax
    band = np.stack([r <= r1, (r > r1) & (r <= r2), r > r2], -1)  # (H,W,3)

    ang = np.arctan2(yy - cy, xx - cx)
    sectors = []
    for a0 in np.linspace(-math.pi, math.pi, 8, endpoint=False):
        sectors.append((ang >= a0) & (ang < a0 + math.pi / 4))
    sect = np.stack(sectors, -1)                                   # (H,W,8)

    # log-radius bins: torch.logspace(log10 1, log10 rmax+1, 40) boundaries,
    # torch.bucketize(r+1, rb) - 1  (appv3.py:1656-1657)
    rb = np.logspace(np.log10(1.0), np.log10(rmax + 1.0), 40)
    ridx = np.searchsorted(rb, (r + 1.0).ravel(), side="left") - 1
    nbins = 39
    binm = np.zeros((h * w, nbins), np.float32)
    valid = (ridx >= 0) & (ridx < nbins)
    binm[np.arange(h * w)[valid], ridx[valid]] = 1.0
    bin_counts = binm.sum(0)                                       # (39,)

    mask = np.concatenate([band.reshape(-1, 3), sect.reshape(-1, 8)],
                          axis=1).astype(np.float32)               # (HW, 11)
    sect_counts = sect.reshape(-1, 8).sum(0).astype(np.float32)

    # least-squares slope weights over xs = arange(39)
    xs = np.arange(nbins, dtype=np.float64)
    xc = xs - xs.mean()
    slope_w = (xc / (xc ** 2).sum()).astype(np.float32)            # (39,)

    # return numpy (not jnp): this function is lru_cached and may first run
    # inside a jit trace — caching device arrays created there leaks tracers.
    return (mask, binm.astype(np.float32),
            bin_counts.astype(np.float32), sect_counts,
            slope_w)


@functools.lru_cache(maxsize=4)
def _dft_mats(n: int):
    k = np.arange(n, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _checkerboard(h: int, w: int):
    i = np.arange(h)[:, None] + np.arange(w)[None, :]
    return np.where(i % 2 == 0, 1.0, -1.0).astype(np.float32)


def fft2_shifted_matmul(gray, dtype=jnp.bfloat16):
    """fftshift(fft2(gray)) as SIX real matmuls on the MXU → (re, im) f32.

    XLA's complex-FFT lowering on TPU costs ~8x a DFT-by-matmul at N=256
    (measured: 3.45 ms vs ~0.4 ms for a 256-image batch) — at these sizes
    the O(N^2 log N) fft loses to the systolic array's O(N^3). The
    frequency shift theorem folds the fftshift in for free: for even N,
    fftshift(F{x}) = F{x * (-1)^(i+j)}. Matmuls run in bf16 with f32
    accumulation — feature-level error is ~1e-3 relative (the 24-d battery
    is statistical; parity test tests/test_freq_features.py)."""
    b, h, w = gray.shape
    f32 = jnp.float32
    ch, sh = _dft_mats(h)
    cw, sw = _dft_mats(w)
    # concatenated form — TWO einsums instead of six:
    #   stage 1: [U; V] = [C; S] @ X            (2h, w) result rows
    #   stage 2: [re | im] = [U V] @ [[C, -S], [-S, -C]]
    # (derivation: (U - iV)(C - iS) = (UC - VS) - i(US + VC))
    a1 = jnp.asarray(np.concatenate([ch, sh], 0).astype(np.float32))
    a2 = jnp.asarray(np.block([[cw, -sw], [-sw, -cw]]).astype(np.float32))
    xs = (gray * jnp.asarray(_checkerboard(h, w))).astype(dtype)
    uv = jnp.einsum("kn,bnm->bkm", a1.astype(dtype), xs,
                    preferred_element_type=f32).astype(dtype)   # (B, 2h, w)
    uv = jnp.concatenate([uv[:, :h], uv[:, h:]], axis=-1)       # (B, h, 2w)
    reim = jnp.einsum("bkm,mj->bkj", uv, a2.astype(dtype),
                      preferred_element_type=f32)               # (B, h, 2w)
    return reim[..., :w], reim[..., w:]


def _on_tpu():
    from tpudf.core.backend import on_tpu
    return on_tpu()


def fft2_mag(x, *, shifted=False, use_matmul_dft=None):
    """|fft2(x)| (optionally fftshifted) for (B, H, W) real input, using the
    MXU DFT-by-matmul on TPU (8x faster than XLA's complex-FFT lowering at
    N<=256) and jnp.fft elsewhere. Shared by the forensic battery."""
    b, h, w = x.shape
    if use_matmul_dft is None:
        use_matmul_dft = _on_tpu()
    if use_matmul_dft and h % 2 == 0 and w % 2 == 0 \
            and max(h, w) <= 1024:
        if shifted:
            re, im = fft2_shifted_matmul(x)
        else:
            # pre-multiplying by the checkerboard cancels the one inside
            # fft2_shifted_matmul → plain (unshifted) DFT coefficients
            re, im = fft2_shifted_matmul(
                x * jnp.asarray(_checkerboard(h, w)))
        return jnp.sqrt(re * re + im * im)
    f = jnp.fft.fft2(x.astype(jnp.complex64))
    if shifted:
        f = jnp.fft.fftshift(f, axes=(-2, -1))
    return jnp.abs(f)


def fft_features(gray, *, use_matmul_dft=None):
    """gray: (B, H, W) float32 in [0,1] (already 256x256 grayscale) → (B, 15).

    Matches appv3.py:1634-1705 feature-by-feature.
    """
    b, h, w = gray.shape
    mask, binm, bin_counts, sect_counts, slope_w = [
        jnp.asarray(a) for a in _static_masks(h, w)]

    if use_matmul_dft is None:
        use_matmul_dft = _on_tpu()
    on_tpu = use_matmul_dft
    if use_matmul_dft and h % 2 == 0 and w % 2 == 0:
        re, im = fft2_shifted_matmul(gray)
        magsq = (re * re + im * im).reshape(b, h * w)
        mag = jnp.sqrt(magsq)
        phase = jnp.arctan2(im, re).reshape(b, h * w)
    else:
        f = jnp.fft.fftshift(jnp.fft.fft2(gray.astype(jnp.complex64)),
                             axes=(-2, -1))
        mag = jnp.abs(f).reshape(b, h * w)
        magsq = mag * mag
        phase = jnp.angle(f).reshape(b, h * w)

    # On TPU the two (B, HW) @ (HW, K) region-sum matmuls run with bf16
    # operands (f32 accumulation): halves the HBM read of the 67 MB mag /
    # logmag intermediates and runs the MXU at full rate. Element rounding
    # is ±2^-9 RANDOM error averaged over 65k-pixel sums → ~1e-5 relative
    # on the features (oracle tolerance 2e-3, test_freq_features).
    mm = jnp.bfloat16 if (on_tpu and _on_tpu()) else jnp.float32
    sums = jnp.einsum("bn,nk->bk", mag.astype(mm), mask.astype(mm),
                      preferred_element_type=jnp.float32)  # 3 bands + 8 sect
    el, em, eh = sums[:, 0], sums[:, 1], sums[:, 2]
    # the 3 radial bands PARTITION the grid, so the total is their sum —
    # folding it into the region matmul saves a separate full pass over
    # the 33 MB mag buffer (bf16-matmul rounding ~1e-5 relative, same
    # budget as the band sums themselves)
    et = el + em + eh + _EPS
    sect_means = sums[:, 3:] / jnp.maximum(sect_counts, 1.0)
    anis = jnp.var(sect_means, axis=1)

    # log-radial slope; log(mag+eps) == 0.5*log(magsq + 2*eps*mag + eps^2),
    # evaluated from magsq so the log pass doesn't re-read mag
    logmag = 0.5 * jnp.log(magsq + (2 * _EPS) * mag + _EPS * _EPS)
    bin_sums = jnp.einsum("bn,nk->bk", logmag.astype(mm), binm.astype(mm),
                          preferred_element_type=jnp.float32)  # (B, 39)
    mu = jnp.where(bin_counts > 0, bin_sums / jnp.maximum(bin_counts, 1.0), 0.0)
    slope = mu @ slope_w

    # phase entropy: 50-bin histogram over [-pi, pi] (torch.histc semantics:
    # right-edge value joins the last bin). Scatter-add is serial on TPU, so
    # the histogram runs as CUMULATIVE boundary counts N_k = #{phase >= a_k}
    # and hist_k = N_k - N_{k+1}: 49 compare+sum passes directly on the f32
    # phase — no floor/index array ever materializes, and it measures ~2x
    # faster than per-bin equality reductions on the v5e (hist_k >= 0 holds
    # exactly because the counts are integer-valued f32 sums).
    nb = 50
    bounds = (np.arange(1, nb, dtype=np.float64) / nb) * (2 * math.pi) \
        - math.pi
    n_ge = jnp.stack(
        [jnp.sum((phase >= bk).astype(jnp.float32), axis=1)
         for bk in bounds.astype(np.float32)], axis=1)       # (B, 49)
    total = jnp.full((b, 1), float(h * w), jnp.float32)
    n_all = jnp.concatenate(
        [total, n_ge, jnp.zeros((b, 1), jnp.float32)], axis=1)
    hist = n_all[:, :-1] - n_all[:, 1:]                      # (B, 50)
    prob = hist / (jnp.sum(hist, axis=1, keepdims=True) + _EPS)
    entropy = -jnp.sum(prob * jnp.log(prob + _EPS), axis=1)

    wave = haar_energies_2level(gray)          # (B, 8)

    return jnp.concatenate([
        jnp.stack([el / et, em / et, eh / et,
                   (eh + _EPS) / (el + _EPS), slope, anis, entropy], axis=-1),
        wave,
    ], axis=-1)


def _extract_freq_impl(gray):
    v = jnp.concatenate([fft_features(gray), srm_features(gray)], axis=-1)
    mean = jnp.mean(v, axis=-1, keepdims=True)
    std = jnp.std(v, axis=-1, keepdims=True, ddof=1)
    out = (v - mean) / (std + _EPS)
    return jnp.where(std < _EPS, jnp.zeros_like(v), out)


def extract_freq_vector(gray):
    """(B, 256, 256) grayscale [0,1] → (B, 24) standardized frequency features
    (appv3.py:1722-1728: concat fft+srm, then (v-mean)/(std+eps) with the
    zero-out guard for flat vectors; std is the unbiased 24-sample std).

    Large batches run as a lax.map over <=256-image chunks on TPU: XLA's
    layout/scheduling choices for the battery degrade superlinearly with
    batch (measured 16.0 ms direct vs 8.7 ms chunked at B=1024 on the v5e);
    per-image features are independent, so chunking is semantics-free."""
    import jax
    b = gray.shape[0]
    if _on_tpu() and b > 256:
        for c in (128, 192, 256, 96, 64):
            if b % c == 0:
                gs = gray.reshape(b // c, c, *gray.shape[1:])
                return jax.lax.map(_extract_freq_impl, gs).reshape(b, 24)
    return _extract_freq_impl(gray)
