"""Temporal (anti-Sora) signal battery over sampled video frames.

Device-computable subset of the reference's 20 temporal signals
(appv3.py:3522-4304), all batched JAX over a (T, H, W[, 3]) frame stack:
  * SigLIP embedding identity drift            (appv3.py:3522-3551)
  * PRNU cross-frame incoherence (+flat)       (:1810-1895; ops/forensics.py)
  * JPEG block-grid drift                      (:1928-1963)
  * background border-histogram inconsistency  (:3798-3834)
  * texture flicker (Laplacian-variance CV)    (:3836-3860)
  * edge flicker (gradient-density CV; Canny → Sobel-threshold proxy)
                                               (:3901-3926)
  * color drift (Lab-mean steps; RGB-mean proxy) (:3928-3952)
  * noise residual incoherence in flat regions (:3954-4009)
  * spectral radial-profile Bhattacharyya drift (:4011-4053)

The optical-flow family (fb-inconsistency, direction coherence,
reprojection, parallax, KLT-style instability, affine outliers) runs ON
DEVICE through ops/flow.py (pyramidal dense LK — the reference's cv2
Farneback/KLT/RANSAC stage, appv3.py:3862-4304, was the last host-CPU hot
loop in the video path). `host_flow_signals` keeps the cv2 version as an
optional cross-check; tests/test_flow.py verifies agreement.

Aggregation mirrors appv3.py:6326-6402: sora_likelihood +
temporal_consistency_score weighted votes and the core/motion-hits flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.ops.forensics import (_block_stats, gaussian_blur, laplacian,
                                 sobel_mag)


def _step_corr(maps):
    """Mean Pearson correlation between consecutive (T, …) maps."""
    t = maps.shape[0]
    a = maps[:-1].reshape(t - 1, -1)
    b = maps[1:].reshape(t - 1, -1)
    am = a - a.mean(1, keepdims=True)
    bm = b - b.mean(1, keepdims=True)
    corr = jnp.sum(am * bm, 1) / (
        jnp.linalg.norm(am, axis=1) * jnp.linalg.norm(bm, axis=1) + 1e-6)
    return jnp.mean(corr)


def identity_drift_from_embeddings(embeds):
    """(T, D) L2-normalized SigLIP embeddings → drift score
    (appv3.py:3522-3551)."""
    sims = jnp.sum(embeds[:-1] * embeds[1:], axis=-1)
    drift = 1.0 - jnp.mean(sims)
    return jnp.clip((drift - 0.08) / 0.35, 0.0, 1.0)


def jpeg_block_drift(gray):
    """(T, 256, 256) grayscale [0,1] → block-variance-map decorrelation
    (appv3.py:1928-1963)."""
    var_map = _block_stats(gray * 255.0, 8, "var")
    mu = jnp.mean(var_map, axis=(1, 2), keepdims=True)
    sd = jnp.std(var_map, axis=(1, 2), keepdims=True)
    maps = (var_map - mu) / (sd + 1e-6)
    mean_corr = _step_corr(maps)
    return jnp.clip((0.40 - mean_corr) / 0.40, 0.0, 1.0)


def background_inconsistency(gray):
    """Border-region 32-bin histogram Bhattacharyya drift
    (appv3.py:3798-3834)."""
    t, h, w = gray.shape
    b = int(min(h, w) * 0.12)
    border_mask = np.zeros((h, w), np.float32)
    border_mask[:b, :] = 1
    border_mask[-b:, :] = 1
    border_mask[:, :b] = 1
    border_mask[:, -b:] = 1
    m = jnp.asarray(border_mask.ravel())
    g = jnp.clip(gray * 255.0, 0, 255).reshape(t, -1)
    idx = (g / 8.0).astype(jnp.int32)
    hist = jnp.stack([jnp.sum((idx == k).astype(jnp.float32) * m, axis=1)
                      for k in range(32)], axis=1)
    # cv2.normalize default = L2 normalization before compareHist
    hist = hist / (jnp.linalg.norm(hist, axis=1, keepdims=True) + 1e-6)
    p = hist[:-1]
    q = hist[1:]
    # Bhattacharyya as cv2: 1 - sum(sqrt(p*q)/sqrt(mean_p*mean_q*N^2)) form;
    # with L2-normalized inputs the reference effectively uses sqrt-affinity
    pn = p / (jnp.sum(p, 1, keepdims=True) + 1e-6)
    qn = q / (jnp.sum(q, 1, keepdims=True) + 1e-6)
    bc = jnp.sum(jnp.sqrt(pn * qn + 1e-12), axis=1)
    diffs = jnp.sqrt(jnp.clip(1.0 - bc, 0.0, 1.0))
    return jnp.clip(jnp.mean(diffs) / 0.35, 0.0, 1.0)


def texture_flicker(gray):
    """Laplacian-variance coefficient of variation (appv3.py:3836-3860)."""
    vals = jnp.var(laplacian(gray * 255.0), axis=(1, 2))
    cv = jnp.std(vals) / (jnp.mean(vals) + 1e-6)
    return jnp.clip((cv - 0.15) / 0.60, 0.0, 1.0)


def edge_flicker(gray, thresh=0.35):
    """Edge-density CV; Canny replaced by a Sobel-magnitude threshold
    (appv3.py:3901-3926)."""
    mag = sobel_mag(gray * 255.0)
    dens = jnp.mean((mag > thresh * 255.0).astype(jnp.float32), axis=(1, 2))
    cv = jnp.std(dens) / (jnp.mean(dens) + 1e-6)
    return jnp.clip((cv - 0.15) / 0.50, 0.0, 1.0)


def color_drift(frames):
    """(T, H, W, 3) [0,1] mean-color step distance (appv3.py:3928-3952;
    RGB-mean proxy for Lab, 0-255 scale)."""
    means = jnp.mean(frames * 255.0, axis=(1, 2))
    diffs = jnp.linalg.norm(means[1:] - means[:-1], axis=1)
    return jnp.clip((jnp.mean(diffs) - 4.0) / 16.0, 0.0, 1.0)


def noise_incoherence(gray):
    """Flat-region noise-residual decorrelation (appv3.py:3954-4009)."""
    g255 = gray * 255.0
    resid = g255 - gaussian_blur(g255, 1.5)
    grad = sobel_mag(g255)
    flat = (grad < 10.0).astype(jnp.float32)
    # joint flat mask per consecutive pair; weighted correlation
    t = gray.shape[0]
    a = resid[:-1].reshape(t - 1, -1)
    b = resid[1:].reshape(t - 1, -1)
    m = (flat[:-1] * flat[1:]).reshape(t - 1, -1)
    msum = jnp.sum(m, axis=1) + 1e-6
    am = a - jnp.sum(a * m, 1, keepdims=True) / msum[:, None]
    bm = b - jnp.sum(b * m, 1, keepdims=True) / msum[:, None]
    num = jnp.sum(am * bm * m, axis=1)
    den = jnp.sqrt(jnp.sum(am * am * m, 1) * jnp.sum(bm * bm * m, 1)) + 1e-6
    mean_corr = jnp.mean(num / den)
    return jnp.clip((0.15 - mean_corr) / 0.15, 0.0, 1.0)


@functools.lru_cache(maxsize=4)
def _radial_hist_matrix(h, w, bins=20):
    cy, cx = h // 2, w // 2
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    rn = r / (r.max() + 1e-6)
    m = np.zeros((h * w, bins), np.float32)
    idx = np.clip((rn * bins).astype(int), 0, bins - 1)
    m[np.arange(h * w), idx.ravel()] = 1.0
    return m, np.maximum(m.sum(0), 1.0)


def spectral_drift(gray):
    """Radial log-FFT profile Bhattacharyya drift (appv3.py:4011-4053).
    gray: (T, H, W) — resized to 128 internally like the reference."""
    t = gray.shape[0]
    g = jax.image.resize(gray, (t, 128, 128), "bilinear") * 255.0
    from tpudf.ops.fft_features import fft2_mag
    mag = jnp.log1p(fft2_mag(g, shifted=True))
    m_np, counts = _radial_hist_matrix(128, 128)
    m = jnp.asarray(m_np)
    prof = (mag.reshape(t, -1) @ m) / jnp.asarray(counts)
    prof = prof / (jnp.sum(prof, 1, keepdims=True) + 1e-6)
    bc = jnp.sum(jnp.sqrt(prof[:-1] * prof[1:] + 1e-12), axis=1)
    return jnp.clip(jnp.mean(1.0 - bc) / 0.25, 0.0, 1.0)


def compute_temporal_signals(frames, embeds=None, include_flow=True):
    """frames: (T, H, W, 3) [0,1] → dict of scalar signals (device graph).

    include_flow adds the dense-LK flow family (ops/flow.py) when T >= 3
    and H, W are pyramid-friendly. A NaN value marks a signal the reference
    would gate out (e.g. parallax on a static scene) — callers drop NaNs
    like missing signals (aggregate_sora handles this)."""
    from tpudf.ops.forensics import prnu_temporal_incoherence
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("thwc,c->thw", frames, w)
    sig = {
        "prnu_drift": prnu_temporal_incoherence(gray),
        "prnu_flat_drift": prnu_temporal_incoherence(
            gray - gaussian_blur(gray, 1.0)),   # denoised variant proxy
        "jpeg_block_drift": jpeg_block_drift(gray),
        "background_inconsistency": background_inconsistency(gray),
        "texture_flicker": texture_flicker(gray),
        "edge_flicker": edge_flicker(gray),
        "color_drift": color_drift(frames),
        "noise_incoherence": noise_incoherence(gray),
        "spectral_drift": spectral_drift(gray),
    }
    t, h, wd = gray.shape
    if include_flow and t >= 3 and h % 16 == 0 and wd % 16 == 0:
        from tpudf.ops.flow import flow_signals
        sig.update(flow_signals(gray))
    if embeds is not None:
        sig["id_drift"] = identity_drift_from_embeddings(embeds)
    return sig


SORA_WEIGHTS = [
    ("id_drift", 0.18), ("prnu_drift", 0.14), ("prnu_flat_drift", 0.10),
    ("parallax_err", 0.09), ("face_topology_drift", 0.07),
    ("face_embedding_drift", 0.07), ("face_track_drift", 0.08),
    ("object_inconsistency", 0.08), ("background_inconsistency", 0.06),
    ("texture_flicker", 0.04), ("flow_fb_inconsistency", 0.05),
    ("flow_dir_incoherence", 0.03), ("klt_instability", 0.04),
    ("affine_inconsistency", 0.02), ("jpeg_block_drift", 0.06),
]

CONSISTENCY_WEIGHTS = [
    ("flow_reprojection", 0.12), ("flow_fb_inconsistency", 0.10),
    ("flow_dir_incoherence", 0.08), ("parallax_err", 0.10),
    ("object_inconsistency", 0.09), ("background_inconsistency", 0.07),
    ("edge_flicker", 0.07), ("texture_flicker", 0.07),
    ("color_drift", 0.05), ("noise_incoherence", 0.04),
    ("spectral_drift", 0.04), ("klt_instability", 0.08),
    ("affine_inconsistency", 0.06), ("prnu_flat_drift", 0.06),
    ("jpeg_block_drift", 0.07),
]


def aggregate_sora(signals: dict):
    """Weighted sora_likelihood + temporal_consistency_score + flag
    (appv3.py:6326-6402). Missing signals are skipped with weight
    renormalization, as in the reference."""
    def vote(weights):
        num = den = 0.0
        for k, w in weights:
            v = signals.get(k)
            if v is None or float(v) != float(v):    # None/NaN = missing
                continue
            num += w * float(v)
            den += w
        return num / den if den > 0 else 0.0

    sora = vote(SORA_WEIGHTS)
    consistency = vote(CONSISTENCY_WEIGHTS)

    def g(k):
        v = signals.get(k)
        if v is None or float(v) != float(v):
            return 0.0
        return float(v)

    core_hits = sum([g("id_drift") > 0.55, g("prnu_drift") > 0.50,
                     g("prnu_flat_drift") > 0.50,
                     g("face_topology_drift") > 0.50,
                     g("face_embedding_drift") > 0.50,
                     g("face_track_drift") > 0.50])
    motion_hits = sum([g("parallax_err") > 0.50,
                       g("object_inconsistency") > 0.60,
                       g("background_inconsistency") > 0.60,
                       g("texture_flicker") > 0.60,
                       g("flow_fb_inconsistency") > 0.55,
                       g("flow_dir_incoherence") > 0.55,
                       g("klt_instability") > 0.55,
                       g("affine_inconsistency") > 0.55])
    flag = bool((sora > 0.60 and core_hits >= 2)
                or (sora > 0.75 and core_hits >= 1 and motion_hits >= 1))
    return {"sora_likelihood": sora,
            "temporal_consistency_score": consistency,
            "sora_flag": flag,
            "core_hits": core_hits, "motion_hits": motion_hits}


def rendering_pipeline_score(frames_uint8):
    """Over-regular camera-simulation score (device re-derivation of
    appv3.py:2525-2566): exposure continuity (64-bin grayscale histogram
    Bhattacharyya between consecutive frames) blended 55/45 with motion-blur
    regularity (exp(-var) of dense-LK flow magnitude sampled at edge
    pixels — ops/flow.exposure_blur_regularity). Higher = suspiciously
    'too perfect'. In the image path the reference feeds [image, h-flip] as
    the frame pair (appv3.py:5128-5195). Returns 0.0 for < 2 frames."""
    if frames_uint8 is None or len(frames_uint8) < 2:
        return 0.0
    from tpudf.ops.flow import exposure_blur_regularity
    frames = np.stack([np.asarray(f) for f in frames_uint8]
                      ).astype(np.float32) / 255.0
    w = np.asarray([0.299, 0.587, 0.114], np.float32)
    gray = frames @ w
    t, h, wd = gray.shape
    if h % 16 or wd % 16 or h < 32 or wd < 32:    # pyramid-friendly size
        import jax
        gray = np.asarray(jax.image.resize(
            jnp.asarray(gray), (t, 256, 256), "bilinear"))
    exposure, blur = exposure_blur_regularity(jnp.asarray(gray))
    score = 0.55 * float(exposure) + 0.45 * float(blur)
    return float(np.clip(score, 0.0, 1.0))


def render_scores_graph(pixels_uint8):
    """Unjitted batched image-path rendering-score graph — callable from a
    larger jitted graph (serve/report's fusion tail) or jitted standalone
    (_jitted_render_scores). (B, H, W, 3) uint8 → (B,) in [0, 1]."""
    from tpudf.ops.flow import exposure_blur_regularity

    x = pixels_uint8.astype(jnp.float32) / 255.0
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    gray = x @ w                                   # (B, H, W)
    b, h, wd = gray.shape
    if h % 16 or wd % 16 or h < 32 or wd < 32:
        gray = jax.image.resize(gray, (b, 256, 256), "bilinear")
    pair = jnp.stack([gray, gray[:, :, ::-1]], axis=1)   # [img, h-flip]
    exposure, blur = jax.vmap(exposure_blur_regularity)(pair)
    return jnp.clip(0.55 * exposure + 0.45 * blur, 0.0, 1.0)


def host_flow_signals(frames_uint8):
    """Optical-flow-family signals via host cv2 (Farneback forward/backward,
    flow direction coherence, KLT track instability, RANSAC affine
    inconsistency — appv3.py:3862-4304). Returns {} if cv2 is unavailable."""
    try:
        import cv2
    except Exception:
        return {}
    t = len(frames_uint8)
    if t < 3:
        return {}
    grays = [cv2.cvtColor(np.asarray(f), cv2.COLOR_RGB2GRAY)
             for f in frames_uint8]
    fb_err, dir_inc, klt, affine = [], [], [], []
    reproj, par = [], []
    hgt, wid = grays[0].shape
    gy, gx = np.mgrid[0:hgt, 0:wid].astype(np.float32)
    # ONE forward Farneback solve per frame pair feeds the fb/direction,
    # reprojection AND parallax families (the solve dominates this host
    # battery's runtime — recomputing it per family tripled it)
    for i in range(t - 1):
        a, b = grays[i], grays[i + 1]
        fwd = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 3, 15, 3, 5,
                                           1.2, 0)
        bwd = cv2.calcOpticalFlowFarneback(b, a, None, 0.5, 3, 15, 3, 5,
                                           1.2, 0)
        err = np.linalg.norm(fwd + bwd, axis=-1)
        fb_err.append(float(np.mean(err)))
        ang = np.arctan2(fwd[..., 1], fwd[..., 0])
        mag = np.linalg.norm(fwd, axis=-1)
        sel = mag > 0.5
        if sel.mean() > 0.01:
            dir_inc.append(float(np.std(np.sin(ang[sel])) +
                                 np.std(np.cos(ang[sel]))) / 2.0)

        # flow reprojection error: warp frame t by its flow, compare to
        # t+1 (appv3.py flow_reprojection_error family). Backward warp:
        # content at x in `b` came from x - flow(x) in `a` (cv2 flow is
        # motion convention: a(x) appears at x + flow in b)
        warped = cv2.remap(a, gx - fwd[..., 0], gy - fwd[..., 1],
                           cv2.INTER_LINEAR)
        reproj.append(float(np.mean(np.abs(
            warped.astype(np.float32) - b.astype(np.float32)))))

        # parallax inconsistency: flow-magnitude roughness across depth
        # layers — pure camera motion gives smooth magnitude fields
        # (appv3.py:2651 family)
        if mag.mean() > 0.2:
            local_std = cv2.blur((mag - cv2.blur(mag, (15, 15))) ** 2,
                                 (15, 15)) ** 0.5
            par.append(float(np.mean(local_std) / (mag.mean() + 1e-6)))

        pts = cv2.goodFeaturesToTrack(a, 200, 0.01, 8)
        if pts is not None and len(pts) >= 8:
            nxt, st, _ = cv2.calcOpticalFlowPyrLK(a, b, pts, None)
            good = st.ravel() == 1
            if good.sum() >= 8:
                klt.append(1.0 - float(good.mean()))
                m, inl = cv2.estimateAffinePartial2D(pts[good], nxt[good],
                                                     method=cv2.RANSAC)
                if inl is not None:
                    affine.append(1.0 - float(inl.mean()))
    out = {}
    if fb_err:
        out["flow_fb_inconsistency"] = float(np.clip(np.mean(fb_err) / 4.0,
                                                     0, 1))
    if dir_inc:
        out["flow_dir_incoherence"] = float(np.clip(np.mean(dir_inc), 0, 1))
    if klt:
        out["klt_instability"] = float(np.clip(np.mean(klt) / 0.5, 0, 1))
    if affine:
        out["affine_inconsistency"] = float(np.clip(np.mean(affine) / 0.6,
                                                    0, 1))

    if reproj:
        out["flow_reprojection"] = float(np.clip(np.mean(reproj) / 20.0,
                                                 0, 1))
    if par:
        out["parallax_err"] = float(np.clip(np.mean(par) / 1.5, 0, 1))

    # ORB object persistence: descriptor match survival across frames
    # (appv3.py:3758 object_identity_inconsistency)
    try:
        orb = cv2.ORB_create(200)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
        surv = []
        prev = orb.detectAndCompute(grays[0], None)
        for i in range(1, t):
            cur = orb.detectAndCompute(grays[i], None)
            if prev[1] is not None and cur[1] is not None \
                    and len(prev[1]) >= 8 and len(cur[1]) >= 8:
                matches = bf.match(prev[1], cur[1])
                surv.append(len(matches) / max(len(prev[1]), 1))
            prev = cur
        if surv:
            out["object_inconsistency"] = float(
                np.clip(1.0 - np.mean(surv), 0, 1))
    except Exception:
        pass
    return out
