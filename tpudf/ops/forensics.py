"""Forensic scalar battery — batched JAX re-implementation.

The reference computes ~40 scalar forensic cues per image with
NumPy/OpenCV/SciPy host loops (appv3.py:1597-3144). Here every cue is a
batched device function over (B, H, W[, 3]) float32 [0,1] inputs with static
shapes, so the whole battery fuses into one XLA graph per image batch.

Approximation notes (host-library ops with no sensible XLA analogue):
  * NlMeans denoising (noiseprint/prnu-acorr) → gaussian-residual proxy,
    same downstream statistics (documented per function);
  * GLCM contrast → exact closed form: GLCM contrast at distance 1 equals
    E[(I(x) - I(x+dx))^2] over the quantized image, computed directly;
  * blockwise HSV 3-D histogram (histogram_consistency) → per-channel
    marginal histograms (32 bins x 3 channels), cosine-similarity over
    blocks as in the reference.

All "score" semantics (higher = more fake vs higher = more real) follow the
reference exactly; see each docstring's anchor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.ops.dct import dct2_8x8

_EPS = 1e-8


# ------------------------------------------------------------ primitives

@functools.lru_cache(maxsize=16)
def _gauss_kernel_np(sigma: float):
    radius = int(4.0 * sigma + 0.5)          # scipy gaussian_filter truncate=4
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32), radius


def gaussian_blur(x, sigma: float):
    """scipy.ndimage.gaussian_filter equivalent (reflect/symmetric padding),
    batched over (B, H, W)."""
    k_np, radius = _gauss_kernel_np(float(sigma))
    k = jnp.asarray(k_np)
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="symmetric")
    xr = jnp.moveaxis(xp, 0, 0)[:, None]      # (B,1,H+2r,W)
    kh = k.reshape(1, 1, -1, 1)
    y = jax.lax.conv_general_dilated(xr, kh, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y[:, 0]
    yp = jnp.pad(y, ((0, 0), (0, 0), (radius, radius)), mode="symmetric")
    yr = yp[:, None]
    kw = k.reshape(1, 1, 1, -1)
    z = jax.lax.conv_general_dilated(yr, kw, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return z[:, 0]


def _conv3x3(x, kernel):
    """(B, H, W) same-size conv with zero padding; kernel numpy (kh, kw)."""
    k = jnp.asarray(kernel, jnp.float32)[None, None]
    ph, pw = kernel.shape[0] // 2, kernel.shape[1] // 2
    return jax.lax.conv_general_dilated(
        x[:, None], k, (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T
_LAPLACE = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
_DEMOSAIC = np.array([[0.25, 0.5, 0.25]], np.float32)


def sobel_mag(gray):
    gx = _conv3x3(gray, _SOBEL_X)
    gy = _conv3x3(gray, _SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy)


def laplacian(gray):
    return _conv3x3(gray, _LAPLACE)


def _block_stats(x, bs, stat="var"):
    """(B, H, W) → per-block stat map (B, H//bs, W//bs)."""
    b, h, w = x.shape
    t = x[:, :h - h % bs, :w - w % bs]
    t = t.reshape(b, h // bs, bs, w // bs, bs)
    if stat == "var":
        return jnp.var(t, axis=(2, 4))
    if stat == "std":
        return jnp.std(t, axis=(2, 4))
    if stat == "mean":
        return jnp.mean(t, axis=(2, 4))
    raise ValueError(stat)


def rgb_to_hsv_sat_hue(img):
    """(B,H,W,3) [0,1] → (sat [0,255], hue [0,180]) cv2 conventions."""
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    sat = jnp.where(mx > 0, d / (mx + _EPS), 0.0) * 255.0
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    hue = jnp.where(
        d < _EPS, 0.0,
        jnp.where(mx == r, (g - b) / (d + _EPS) % 6.0,
                  jnp.where(mx == g, (b - r) / (d + _EPS) + 2.0,
                            (r - g) / (d + _EPS) + 4.0)))
    return sat, hue * 30.0          # degrees/2 as cv2 (0..180)


# ------------------------------------------------------------------ PRNU

def extract_prnu(gray, sigma=3.0):
    """Gaussian-residual PRNU map, zero-mean unit-std (appv3.py:1777-1800).
    gray: (B, H, W) [0,1] → (B, H, W)."""
    noise = gray - gaussian_blur(gray, sigma)
    mu = jnp.mean(noise, axis=(1, 2), keepdims=True)
    sd = jnp.std(noise, axis=(1, 2), keepdims=True)
    return (noise - mu) / (sd + _EPS)


def prnu_strength(noise):
    """mean |noise| (appv3.py:1905-1909)."""
    return jnp.mean(jnp.abs(noise), axis=(1, 2))


def prnu_consistency_score(gray):
    """var of the standardized PRNU map (appv3.py:1802-1804).
    ≈1 by construction; kept for parity."""
    return jnp.var(extract_prnu(gray), axis=(1, 2))


def prnu_fft_consistency(noise):
    """Column-mean radial profile roughness of |FFT(noise)|
    (appv3.py:2405-2417)."""
    from tpudf.ops.fft_features import fft2_mag
    mag = fft2_mag(noise)
    radial = jnp.mean(mag, axis=1)                    # (B, W)
    # gaussian smooth along the profile
    k_np, radius = _gauss_kernel_np(3.0)
    k = jnp.asarray(k_np)
    rp = jnp.pad(radial, ((0, 0), (radius, radius)), mode="symmetric")
    smooth = jax.lax.conv_general_dilated(
        rp[:, None, None, :], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0, 0]
    return jnp.mean(jnp.abs(radial - smooth), axis=1)


def prnu_acorr(gray):
    """PRNU autocorrelation peak through the (x-0.95)*20 squash
    (appv3.py:2081-2095). The reference runs cv2.matchTemplate(noise,
    noise, TM_CCORR_NORMED) with template == image, which yields the 1x1
    ZERO-LAG normalized autocorrelation <n,n>/(||n||·||n||) — exactly 1.0
    for any nonzero residual — so the cue's observable is 1.0 on every
    non-degenerate image (and its 0.18 weight in real_image_prior_v3 is a
    constant real tilt). Computing that same expression here keeps the
    cascade's real-prior distribution aligned with the reference; a
    zero-residual (flat) image degenerates to 0 like the reference's
    exception path."""
    noise = gray * 255.0 - gaussian_blur(gray * 255.0, 1.5)
    energy = jnp.sum(noise * noise, axis=(1, 2))
    ac_peak = energy / (energy + _EPS)
    return jnp.clip((ac_peak - 0.95) * 20.0, 0.0, 1.0)


def prnu_temporal_incoherence(frames_gray):
    """Cross-frame PRNU correlation → incoherence score
    (appv3.py:1810-1846). frames_gray: (T, H, W) [0,1] → scalar."""
    prnus = extract_prnu(frames_gray)
    a = prnus[:-1].reshape(prnus.shape[0] - 1, -1)
    b = prnus[1:].reshape(prnus.shape[0] - 1, -1)
    am = a - a.mean(1, keepdims=True)
    bm = b - b.mean(1, keepdims=True)
    corr = jnp.sum(am * bm, 1) / (
        jnp.linalg.norm(am, axis=1) * jnp.linalg.norm(bm, axis=1) + _EPS)
    mean_corr = jnp.mean(corr)
    return jnp.clip((0.35 - mean_corr) / 0.35, 0.0, 1.0)


# ------------------------------------------------------------------- CFA

def extract_cfa_strength(img):
    """Green-channel horizontal-difference CFA strength (appv3.py:2020-2033).
    img: (B,H,W,3) [0,1]; internally uses 0-255 scale like the reference."""
    g = img[..., 1] * 255.0
    diff = jnp.abs(g[:, :, 1:] - g[:, :, :-1])
    avg = jnp.mean(diff, axis=(1, 2))
    return jnp.clip(1.0 - jnp.clip(avg / 32.0, 0.0, 1.0), 0.0, 1.0)


def extract_cfa_inverse(img):
    return 1.0 - extract_cfa_strength(img)


def cfa_bayer_score(gray):
    """Diagonal-difference periodicity fake score (appv3.py:3133-3144).
    gray in [0,1]; reference works on 0-255."""
    y = gray * 255.0
    ad = jnp.abs(y[:, 2:, 2:] - y[:, :-2, :-2])
    periodicity = jnp.mean(ad, axis=(1, 2))
    return jnp.clip((periodicity - 5.0) / 15.0, 0.0, 1.0)


def extract_demosaic_error(img):
    """[0.25,0.5,0.25] green-channel reconstruction error
    (appv3.py:2103-2113)."""
    g = img[..., 1] * 255.0
    recon = _conv3x3(g, _DEMOSAIC)
    err = jnp.mean(jnp.abs(g - recon), axis=(1, 2))
    return jnp.clip(err / 20.0, 0.0, 1.0)


# ------------------------------------------------------------------ JPEG

def jpeg_residual_dct(gray):
    """Mean |AC| of 8x8 DCT blocks / 40 (appv3.py:2036-2052, 2116-2131).
    gray [0,1]; the reference subtracts 128 on 0-255 scale."""
    y = gray * 255.0 - 128.0
    co = dct2_8x8(y)
    b, h, w = co.shape
    bl = co.reshape(b, h // 8, 8, w // 8, 8)
    # reference averages |d[1:,1:]| per block (49 entries, not all 63 AC)
    mean_ac = jnp.mean(jnp.abs(bl[:, :, 1:, :, 1:]), axis=(1, 2, 3, 4))
    return jnp.clip(mean_ac / 40.0, 0.0, 1.0)


def qtable_consistency(gray):
    """16x16 block std-of-std consistency (appv3.py:2134-2149)."""
    stds = _block_stats(gray * 255.0, 16, "std")
    var = jnp.std(stds, axis=(1, 2))
    return jnp.clip(1.0 - jnp.clip(var / 20.0, 0.0, 1.0), 0.0, 1.0)


def jpeg_block_consistency(gray):
    """8x8 block-variance consistency, higher → more real
    (appv3.py:1911-1925)."""
    blk = _block_stats(gray * 255.0, 8, "var")
    return 1.0 - jnp.minimum(jnp.std(blk, axis=(1, 2)) / 50.0, 1.0)


def jpeg_q_mismatch(gray):
    """Per-8x8-block Laplacian-variance spread (appv3.py:2506-2515)."""
    lap = laplacian(gray * 255.0)
    blk = _block_stats(lap, 8, "var")
    return jnp.minimum(jnp.std(blk, axis=(1, 2)) / 30.0, 1.0)


# --------------------------------------------------------------- priors

def grain_likelihood(gray):
    """Photographic-grain prior, higher → more real (appv3.py:1993-1998)."""
    hp = gray * 255.0 - gaussian_blur(gray * 255.0, 1.2)
    return jnp.minimum(jnp.mean(jnp.abs(hp), axis=(1, 2)) / 3.0, 1.0)


def highlight_clipping_realness(gray):
    """Fraction of clipped highlights / 5% (appv3.py:1966-1970)."""
    bright = jnp.mean((gray * 255.0 > 245.0).astype(jnp.float32), axis=(1, 2))
    return jnp.minimum(bright / 0.05, 1.0)


def crop_consistency_score(img):
    """Crop-variance stability, higher → more real (appv3.py:1973-1990).
    Deterministic variant: a fixed 3x3 grid of third-size crops instead of
    the reference's 8 random ones (jit-friendly and reproducible; the
    statistic is a variance spread, insensitive to the sampling pattern)."""
    x = img * 255.0
    b, h, w, _ = x.shape
    ch, cw = h // 3, w // 3
    crops = []
    offs = [0, (h - ch) // 2, h - ch]
    for oy in offs:
        for ox in [0, (w - cw) // 2, w - cw]:
            crops.append(jnp.var(
                jax.lax.dynamic_slice(x, (0, oy, ox, 0), (b, ch, cw, 3)),
                axis=(1, 2, 3)))
    scores = jnp.stack(crops, axis=1)
    return 1.0 - jnp.minimum(jnp.std(scores, axis=1) / 100.0, 1.0)


def hf_glcm_contrast(gray):
    """High-frequency GLCM contrast (appv3.py:2152-2167). GLCM contrast at
    distance 1, angle 0 equals E[(I(x,y) - I(x,y+1))^2] over the normalized
    Laplacian — computed in closed form (no 256x256 co-occurrence matrix)."""
    hf = laplacian(gray * 255.0)
    lo = jnp.min(hf, axis=(1, 2), keepdims=True)
    hi = jnp.max(hf, axis=(1, 2), keepdims=True)
    norm = jnp.round((hf - lo) / (hi - lo + _EPS) * 255.0)
    d = norm[:, :, 1:] - norm[:, :, :-1]
    contrast = jnp.mean(d * d, axis=(1, 2))
    return jnp.clip(contrast / 2000.0, 0.0, 1.0)


def multiscale_fft_confidence(gray):
    """Spectral-energy stability across 256/128/64 rescales → bool-ish
    (appv3.py:2202-2222). Returns (B,) 1.0 = stable (real-like).

    Parity note: raw |FFT| std roughly halves with each resolution halving,
    so diff ≈ 0.9·mean and the reference's `diff < 0.15*mean` test is
    almost never true on natural images — the reference cue (and therefore
    this one) effectively always votes 0.0; its real-camera override in the
    cascade is correspondingly rare. Kept formula-exact rather than
    "fixed", since cascade thresholds were tuned against this behavior."""
    scores = []
    b = gray.shape[0]
    for sz in (256, 128, 64):
        g = jax.image.resize(gray, (b, sz, sz), method="bilinear") * 255.0
        from tpudf.ops.fft_features import fft2_mag
        mag = fft2_mag(g, shifted=True)
        scores.append(jnp.std(mag, axis=(1, 2)))
    s = jnp.stack(scores, axis=1)
    diff = jnp.max(s, axis=1) - jnp.min(s, axis=1)
    mean = jnp.mean(s, axis=1) + 1e-6
    return (diff < 0.15 * mean).astype(jnp.float32)


def noiseprint_score(gray):
    """Noise-variance inconsistency over 64px patches, higher → more fake
    (appv3.py:2225-2245; NlMeans → gaussian-denoise proxy)."""
    g255 = gray * 255.0
    residual = g255 - gaussian_blur(g255, 1.5)
    pv = _block_stats(residual, 64, "var").reshape(gray.shape[0], -1)
    mean_v = jnp.mean(pv, axis=1) + 1e-6
    std_v = jnp.std(pv, axis=1)
    consistency = 1.0 - jnp.minimum(std_v / mean_v, 1.0)
    return jnp.clip(1.0 - consistency, 0.0, 1.0)


# ------------------------------------------------------- diffusion cues

def perlin_diffusion_score(img):
    """Fixed perlin-diffusion smoothness score (appv3.py:2734-2777).
    img: (B,H,W,3) [0,1] RGB."""
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("bhwc,c->bhw", img, w)
    gx = _conv3x3(gray, _SOBEL_X)
    gy = _conv3x3(gray, _SOBEL_Y)
    grad = jnp.sqrt(gx * gx + gy * gy)
    grad_norm = grad / (jnp.mean(grad, axis=(1, 2), keepdims=True) + 1e-6)
    smoothness = jnp.exp(-jnp.std(grad_norm, axis=(1, 2)))
    hp = gray - gaussian_blur(gray, 1.2)
    hf_penalty = jnp.clip(1.0 - jnp.std(hp, axis=(1, 2)) / 0.03, 0.0, 1.0)
    ent = laplacian(gray)
    entropy_score = jnp.exp(-jnp.std(ent, axis=(1, 2)))
    prnu_map = gray - gaussian_blur(gray, 2.5)
    prnu_penalty = jnp.clip(1.0 - jnp.std(prnu_map, axis=(1, 2)) / 0.01,
                            0.0, 1.0)
    return jnp.clip(0.45 * smoothness + 0.25 * hf_penalty
                    + 0.15 * entropy_score + 0.15 * prnu_penalty, 0.0, 1.0)


@functools.lru_cache(maxsize=4)
def _radial_band_matrix(h, w, lo_frac, hi_frac):
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    rint = r.astype(np.int32)
    rmax = int(r.max())
    lo = max(2, int(lo_frac * rmax))
    hi = max(lo + 1, int(hi_frac * rmax))
    nb = hi - lo
    m = np.zeros((h * w, nb), np.float32)
    valid = (rint >= lo) & (rint < hi)
    m[np.arange(h * w)[valid.ravel()], (rint.ravel() - lo)[valid.ravel()]] = 1
    counts = m.sum(0)
    return m, counts


def diffusion_perlin_residual(gray):
    """Laplacian-residual radial-PSD log-log slope → diffusion score
    (appv3.py:2811-2863)."""
    b, h, w = gray.shape
    g = gray * 255.0
    g = (g - jnp.mean(g, axis=(1, 2), keepdims=True)) / (
        jnp.std(g, axis=(1, 2), keepdims=True) + 1e-6)
    res = laplacian(g)
    from tpudf.ops.fft_features import fft2_mag
    psd = fft2_mag(res, shifted=True) ** 2
    m_np, counts_np = _radial_band_matrix(h, w, 0.2, 0.8)
    m = jnp.asarray(m_np)
    counts = jnp.asarray(np.maximum(counts_np, 1.0))
    sums = psd.reshape(b, -1) @ m
    radial = sums / counts + 1e-8
    radial = radial / jnp.max(radial, axis=1, keepdims=True)
    nb = radial.shape[1]
    log_f = jnp.log(jnp.arange(nb, dtype=jnp.float32) + 1e-6)
    log_p = jnp.log(radial + 1e-6)
    xc = log_f - jnp.mean(log_f)
    slope = (log_p @ xc) / jnp.sum(xc * xc)
    return jnp.clip(slope + 1.0, 0.0, 1.0)


def perlin_residual_score(gray):
    """Radial-PSD flatness of the Laplacian residual (appv3.py:2780-2809)."""
    b, h, w = gray.shape
    hp = laplacian(gray)
    from tpudf.ops.fft_features import fft2_mag
    psd = fft2_mag(hp, shifted=True) ** 2
    m_np, counts_np = _radial_band_matrix(h, w, 0.2, 0.8)
    m = jnp.asarray(m_np)
    counts = jnp.asarray(np.maximum(counts_np, 1.0))
    radial = psd.reshape(b, -1) @ m / counts + 1e-9
    radial = radial / jnp.max(radial, axis=1, keepdims=True)
    return jnp.clip(1.0 - jnp.var(radial, axis=1), 0.0, 1.0)


def spectral_flatness_score(gray):
    """Mid-band geometric/arithmetic PSD flatness (appv3.py:3068-3096)."""
    b, h, w = gray.shape
    from tpudf.ops.fft_features import fft2_mag
    psd = fft2_mag(gray, shifted=True) ** 2 + 1e-8
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    mask = jnp.asarray(((r > 0.2 * min(h, w)) & (r < 0.6 * min(h, w)))
                       .astype(np.float32).ravel())
    n = jnp.sum(mask)
    flat = psd.reshape(b, -1)
    gm = jnp.exp((jnp.log(flat) @ mask) / n)
    am = (flat @ mask) / n
    flatness = gm / (am + 1e-8)
    return jnp.clip(1.0 - flatness * 10.0, 0.0, 1.0)


def esrgan_grid_score(gray):
    """Every-8th-row/col log-spectrum energy (upscaler grid artifact,
    appv3.py:2481-2486)."""
    from tpudf.ops.fft_features import fft2_mag
    mag = jnp.log1p(fft2_mag(gray * 255.0, shifted=True))
    v = jnp.mean(mag[:, :, ::8], axis=(1, 2))
    h = jnp.mean(mag[:, ::8, :], axis=(1, 2))
    return jnp.clip((v + h) / 50.0, 0.0, 1.0)


# ----------------------------------------------------------- color cues

def saturation_peak_score(img):
    """Fraction of saturation > 200 / 5% (appv3.py:2489-2493)."""
    sat, _ = rgb_to_hsv_sat_hue(img)
    ratio = jnp.mean((sat > 200.0).astype(jnp.float32), axis=(1, 2))
    return jnp.minimum(ratio / 0.05, 1.0)


def color_harmony_score(img):
    """Hue-histogram dispersion (appv3.py:2996-3004)."""
    _, hue = rgb_to_hsv_sat_hue(img)
    b = img.shape[0]
    idx = jnp.clip((hue / 5.0), 0, 35).astype(jnp.int32).reshape(b, -1)
    hist = jnp.stack([jnp.sum((idx == k).astype(jnp.float32), axis=1)
                      for k in range(36)], axis=1)
    return jnp.minimum(jnp.std(hist, axis=1) / 200.0, 1.0)


def color_correlation_score(img):
    """Patchwise RGB channel decorrelation (appv3.py:3099-3130)."""
    b, h, w, _ = img.shape
    ps = 32
    x = img[:, :h - h % ps, :w - w % ps]
    t = x.reshape(b, h // ps, ps, w // ps, ps, 3)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ps * ps, 3)
    mu = jnp.mean(t, axis=2, keepdims=True)
    c = t - mu
    sd = jnp.std(t, axis=2) + _EPS                       # (b, n, 3)
    cov = jnp.einsum("bnpc,bnpd->bncd", c, c) / (ps * ps)
    corr_rg = cov[..., 0, 1] / (sd[..., 0] * sd[..., 1])
    corr_rb = cov[..., 0, 2] / (sd[..., 0] * sd[..., 2])
    corr_gb = cov[..., 1, 2] / (sd[..., 1] * sd[..., 2])
    mean_corr = jnp.mean((corr_rg + corr_rb + corr_gb) / 3.0, axis=1)
    return jnp.clip(1.0 - (mean_corr - 0.3) * 2.0, 0.0, 1.0)


def histogram_consistency(img):
    """Blockwise color-histogram inconsistency (appv3.py:3007-3047;
    marginal-histogram approximation, cosine similarity over 64px blocks)."""
    b, h, w, _ = img.shape
    bs, bins = 64, 32
    x = img[:, :h - h % bs, :w - w % bs]
    gh, gw = x.shape[1] // bs, x.shape[2] // bs
    t = x.reshape(b, gh, bs, gw, bs, 3).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(b, gh * gw, bs * bs, 3)
    idx = jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)
    # per-channel histograms via masked sums
    hists = []
    for c in range(3):
        ic = idx[..., c]
        hists.append(jnp.stack(
            [jnp.sum((ic == k).astype(jnp.float32), axis=2)
             for k in range(bins)], axis=-1))
    hist = jnp.concatenate(hists, axis=-1)               # (b, nb, 96)
    hist = hist / (jnp.linalg.norm(hist, axis=-1, keepdims=True) + _EPS)
    sim = jnp.einsum("bnd,bmd->bnm", hist, hist)
    return jnp.clip(1.0 - jnp.mean(sim, axis=(1, 2)), 0.0, 1.0)


# --------------------------------------------------------- texture cues

def texture_noise_score(img):
    """Texture uniformity + HF noise anomaly (appv3.py:2955-2972)."""
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("bhwc,c->bhw", img, w)
    pv = _block_stats(gray, 32, "var").reshape(gray.shape[0], -1)
    texture_var = jnp.var(pv, axis=1)
    texture_score = 1.0 - jnp.minimum(texture_var / 0.05, 1.0)
    lap = laplacian(gray)
    hf = jnp.var(lap, axis=(1, 2)) / (
        jnp.mean(jnp.abs(lap), axis=(1, 2)) + 1e-6)
    noise_score = jnp.minimum(hf / 5.0, 1.0)
    return jnp.clip(0.5 * texture_score + 0.5 * noise_score, 0.0, 1.0)


def vov_score(gray):
    """Variance-of-variance smoothness score (appv3.py:2866-2883)."""
    pv = _block_stats(gray, 32, "var").reshape(gray.shape[0], -1)
    v = jnp.var(pv, axis=1)
    return jnp.clip(1.0 - v / (v + 0.05), 0.0, 1.0)


def asymmetry_score(img):
    """Left-right mirror similarity, higher → more fake
    (appv3.py:2974-2993)."""
    x = img * 255.0
    w = x.shape[2]
    mid = w // 2
    left = x[:, :, :mid]
    right = jnp.flip(x[:, :, w - mid:], axis=2)
    diff = jnp.mean(jnp.abs(left - right), axis=(1, 2, 3))
    return jnp.clip(1.0 - jnp.minimum(diff / 25.0, 1.0), 0.0, 1.0)


def exposure_variation(gray):
    """Std of the equalized histogram (appv3.py:2518-2521). Histogram
    equalization via the empirical CDF."""
    b = gray.shape[0]
    g = jnp.clip((gray * 255.0), 0, 255).astype(jnp.int32).reshape(b, -1)
    hist = jnp.stack([jnp.sum((g == k).astype(jnp.float32), axis=1)
                      for k in range(256)], axis=1)
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    eq = jnp.take_along_axis(cdf, g, axis=1) * 255.0
    return jnp.std(eq, axis=1) / 60.0


# ------------------------------------------------- benford / self-sim

_BENFORD = np.log10(1.0 + 1.0 / np.arange(1, 10)).astype(np.float32)


def benford_distance(band):
    """L1 distance of the leading-digit histogram from Benford's law
    (appv3.py:1750-1764). band: (B, N) wavelet coefficients → (B,).
    Values with |x| <= 1 are excluded, exactly as the reference."""
    x = jnp.abs(band)
    valid = x > 1.0
    xs = jnp.maximum(x, 1.0)
    mags = jnp.floor(jnp.log10(xs) + 1e-9)
    lead = jnp.floor(xs / jnp.power(10.0, mags)).astype(jnp.int32)
    lead = jnp.where(valid & (lead >= 1) & (lead <= 9), lead, 0)
    counts = jnp.stack([jnp.sum((lead == d).astype(jnp.float32), axis=-1)
                        for d in range(1, 10)], axis=-1)          # (B, 9)
    tot = jnp.sum(counts, axis=-1, keepdims=True)
    probs = counts / (tot + _EPS)
    dist = jnp.sum(jnp.abs(probs - jnp.asarray(_BENFORD)), axis=-1)
    return jnp.where(tot[..., 0] > 0, dist, 0.0)


def benford_wavelet_score(gray):
    """Mean Benford distance over the db1 detail bands (appv3.py:1766-1775;
    the reference tries bior4.4 then falls back to db1 — we use the db1
    branch, which ops/dwt.py implements exactly). gray: (B,H,W) [0,1]."""
    from tpudf.ops.dwt import haar_dwt2
    _, (lh, hl, hh) = haar_dwt2(gray * 255.0)
    b = gray.shape[0]
    d = [benford_distance(c.reshape(b, -1)) for c in (lh, hl, hh)]
    return (d[0] + d[1] + d[2]) / 3.0


@functools.lru_cache(maxsize=2)
def _selfsim_pair_mask(n_grid: int, patch: int):
    """Static valid-pair mask for the self-similarity score: upper-triangle
    pairs whose patch coordinates differ by >= 2*patch in y OR x (the
    reference excludes near neighbours, appv3.py:2913-2915)."""
    coords = np.stack(np.mgrid[0:n_grid, 0:n_grid], -1).reshape(-1, 2) * patch
    dy = np.abs(coords[:, None, 0] - coords[None, :, 0])
    dx = np.abs(coords[:, None, 1] - coords[None, :, 1])
    far = (dy >= 2 * patch) | (dx >= 2 * patch)
    upper = np.triu(np.ones((len(coords), len(coords)), bool), k=1)
    return (far & upper).astype(np.float32)


def self_similarity_anomaly_score(img, patch: int = 16):
    """Fraction of distant patch pairs with cosine similarity > 0.90
    (appv3.py:2886-2923). Deterministic TPU variant: instead of the
    reference's 200-of-961 random stride-8 sample we use the full
    non-overlapping 16px grid (256 patches, 32k valid pairs) — one einsum.
    img: (B, 256, 256, 3) [0,1]."""
    b, h, w, c = img.shape
    ng = h // patch
    t = img.reshape(b, ng, patch, ng, patch, c)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, ng * ng, patch * patch * c)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-9)
    sims = jnp.einsum("bnd,bmd->bnm", t, t)
    mask = jnp.asarray(_selfsim_pair_mask(ng, patch))
    high = jnp.sum((sims > 0.90).astype(jnp.float32) * mask, axis=(1, 2))
    return jnp.clip(high / jnp.sum(mask), 0.0, 1.0)


def forensic_classic_score(gray):
    """PRNU-consistency classic forensic score (appv3.py:2722-2727)."""
    pr = prnu_consistency_score(gray)
    return jnp.clip(1.0 - jnp.minimum(pr / 3.5, 1.0), 0.0, 1.0)


def diffusion_score_v2(gray, img):
    """The reference's composite diffusion score (appv3.py:2927-2931):
    0.4*perlin_residual + 0.3*vov + 0.3*self_similarity."""
    return jnp.clip(0.4 * perlin_residual_score(gray) + 0.3 * vov_score(gray)
                    + 0.3 * self_similarity_anomaly_score(img), 0.0, 1.0)


def forensic_v2_score(gray, img):
    """forensic_v2 composite (appv3.py:2934-2951): classic + perlin +
    texture/noise + noiseprint blended 40/60 with the diffusion score.
    Returns (forensic_v2, diffusion) as the reference does."""
    diff = diffusion_score_v2(gray, img)
    v3 = jnp.clip(0.30 * forensic_classic_score(gray)
                  + 0.30 * perlin_diffusion_score(img)
                  + 0.20 * texture_noise_score(img)
                  + 0.20 * noiseprint_score(gray), 0.0, 1.0)
    return jnp.clip(0.4 * v3 + 0.6 * diff, 0.0, 1.0), diff


# ---------------------------------------------------- aggregate priors

def real_image_prior_v2(img, gray):
    """PRNU + CFA-inverse + JPEG DCT prior (appv3.py:2055-2080)."""
    prnu_std = jnp.clip(jnp.std(gray * 255.0
                                - gaussian_blur(gray * 255.0, 3.0),
                                axis=(1, 2)) / 10.0, 0.0, 1.0)
    cfa_inv = extract_cfa_inverse(img)
    jpeg_res = jpeg_residual_dct(gray)
    return jnp.clip(prnu_std * 0.40 + cfa_inv * 0.35 + jpeg_res * 0.25,
                    0.0, 1.0)


def real_image_prior_v3(img, gray):
    """7-cue real prior (appv3.py:2170-2199)."""
    prnu_std = jnp.clip(jnp.std(gray * 255.0
                                - gaussian_blur(gray * 255.0, 3.0),
                                axis=(1, 2)) / 10.0, 0.0, 1.0)
    prnu_ac = prnu_acorr(gray)
    cfa_inv = extract_cfa_inverse(img)
    dem_err = extract_demosaic_error(img)
    jpeg_res = jpeg_residual_dct(gray)
    jpeg_q = qtable_consistency(gray)
    glcm = hf_glcm_contrast(gray)
    return jnp.clip(prnu_std * 0.22 + prnu_ac * 0.18 + (1 - cfa_inv) * 0.12
                    + (1 - dem_err) * 0.12 + jpeg_res * 0.12
                    + jpeg_q * 0.12 + glcm * 0.12, 0.0, 1.0)


def real_prior_v2_aggregate(img, gray):
    """7-way aggregate real prior (appv3.py:3050-3066)."""
    r1 = jpeg_block_consistency(gray)
    r2 = highlight_clipping_realness(gray)
    r3 = crop_consistency_score(img)
    r4 = 1.0 - cfa_bayer_score(gray)
    r5 = jnp.clip(prnu_consistency_score(gray), 0.0, 1.0)
    r6 = grain_likelihood(gray)
    r7 = multiscale_fft_confidence(gray)
    return jnp.clip((r1 + r2 + r3 + r4 + r5 + r6 + r7) / 7.0, 0.0, 1.0)


def real_hard_override(cfa, grain, jpeg):
    """(B,) bool hard-real override (appv3.py:2471-2478)."""
    return (cfa < 0.18) & (grain > 0.80) & (jpeg < 0.002)


# ---------------------------------------------------- generator vote

GEN_WEIGHTS = (("diffusion", 0.18), ("perlin", 0.12), ("texture_noise", 0.10),
               ("render", 0.08), ("jpeg_q", 0.10), ("sat_peak", 0.08),
               ("spectral", 0.08), ("cfa_fake", 0.10), ("esrgan", 0.06),
               ("embedding_anomaly", 0.05), ("patch_spread", 0.04),
               ("head_delta", 0.03))
REAL_GUARD_WEIGHTS = (("prnu_scaled", 0.25), ("grain_real", 0.20),
                      ("real_prior_v4", 0.25), ("hc_score", 0.15),
                      ("jpeg_q_inv", 0.15))


def image_generator_likelihood(signals: dict):
    """Weighted synthetic-likelihood vote with real-guard attenuation
    (appv3.py:2569-2645). signals: dict of (B,) arrays; missing keys are
    skipped (weights renormalized), as in the reference."""
    num = 0.0
    den = 0.0
    for k, w in GEN_WEIGHTS:
        if k in signals and signals[k] is not None:
            num = num + jnp.clip(signals[k], 0.0, 1.0) * w
            den = den + w
    raw = num / jnp.maximum(den, 1e-6) if den else 0.0

    gnum, gden = 0.0, 0.0
    guard = dict(signals)
    if "jpeg_q" in signals and signals["jpeg_q"] is not None:
        guard["jpeg_q_inv"] = 1.0 - jnp.clip(signals["jpeg_q"], 0.0, 1.0)
    for k, w in REAL_GUARD_WEIGHTS:
        if k in guard and guard[k] is not None:
            gnum = gnum + jnp.clip(guard[k], 0.0, 1.0) * w
            gden = gden + w
    real_guard = gnum / jnp.maximum(gden, 1e-6) if gden else 0.0

    return jnp.clip(raw * (1.0 - 0.55 * real_guard), 0.0, 1.0)


# ----------------------------------------------------------- batteries

def forensic_battery(img):
    """Run the full static-image battery on (B, 256, 256, 3) [0,1] RGB.
    Returns dict of (B,) scores — one jitted graph."""
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("bhwc,c->bhw", img, w)
    noise = extract_prnu(gray)
    out = {
        "prnu_strength": prnu_strength(noise),
        "prnu_fft_consistency": prnu_fft_consistency(noise),
        "prnu_acorr": prnu_acorr(gray),
        "cfa_strength": extract_cfa_strength(img),
        "cfa_fake": cfa_bayer_score(gray),
        "demosaic_error": extract_demosaic_error(img),
        "jpeg_residual": jpeg_residual_dct(gray),
        "jpeg_block_consistency": jpeg_block_consistency(gray),
        "jpeg_q_mismatch": jpeg_q_mismatch(gray),
        "qtable_consistency": qtable_consistency(gray),
        "grain": grain_likelihood(gray),
        "highlight_clipping": highlight_clipping_realness(gray),
        "crop_consistency": crop_consistency_score(img),
        "glcm_contrast": hf_glcm_contrast(gray),
        "multiscale_fft": multiscale_fft_confidence(gray),
        "noiseprint": noiseprint_score(gray),
        "perlin": perlin_diffusion_score(img),
        "perlin_residual": perlin_residual_score(gray),
        "diffusion": diffusion_perlin_residual(gray),
        "spectral_flatness": spectral_flatness_score(gray),
        "esrgan_grid": esrgan_grid_score(gray),
        "saturation_peak": saturation_peak_score(img),
        "color_harmony": color_harmony_score(img),
        "color_correlation": color_correlation_score(img),
        "histogram_consistency": histogram_consistency(img),
        "texture_noise": texture_noise_score(img),
        "vov": vov_score(gray),
        "asymmetry": asymmetry_score(img),
        "exposure_variation": exposure_variation(gray),
        "real_prior_v2": real_image_prior_v2(img, gray),
        "real_prior_v3": real_image_prior_v3(img, gray),
        "real_prior_agg": real_prior_v2_aggregate(img, gray),
        "benford_wavelet": benford_wavelet_score(gray),
        "self_similarity": self_similarity_anomaly_score(img),
    }
    fv2, diff_v2 = forensic_v2_score(gray, img)
    out["diffusion_v2"] = diff_v2
    out["forensic_v2"] = fv2
    return out
