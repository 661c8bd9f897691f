"""End-to-end image prediction: experts → forensics → fusion → labels → JSON.

The batched equivalent of the reference `_predict_single_image`
(appv3.py:5117-6227): runs the detection engine (multicrop/TTA/patch-grid),
the forensic battery, the generator-likelihood vote, Bayesian + Dirichlet
fusion, then the label-policy cascade and verdict, and emits the ~50-signal
JSON report (appv3.py:6112-6164).

Device work happens in two jitted graphs (engine + forensics); the label
cascade is host-side per-image decision logic.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from tpudf.fuse.bayesian import bayesian_fuse_v2, dirichlet_fuse
from tpudf.fuse.decision import (DecisionConfig, DEFAULT_DECISION,
                                 classify_rbr, classify_three_way,
                                 full_label_cascade)
from tpudf.fuse.verdict import decide_verdict
from tpudf.ops.forensics import forensic_battery, image_generator_likelihood
from tpudf.serve.engine import DetectEngine


@functools.lru_cache(maxsize=2)
def _jitted_battery():
    return jax.jit(forensic_battery)


def _embedding_anomaly(core, mean_real):
    """0.6 x L2-norm term + 0.4 x cosine-deviation term vs the cached
    mean-real embedding (appv3.py:3494-3516). Returns (score, l2, cos_dev)
    arrays; cos_dev is 0 when no mean-real anchor is loaded, exactly like
    the reference without MEAN_EMBEDDING."""
    l2 = np.asarray(core["embed_l2"], np.float64)
    l2n = np.minimum(1.0, l2 / 28.0)
    cos_dev = np.zeros_like(l2)
    if mean_real is not None:
        feat = np.asarray(core["embed_feat"], np.float64)
        mr = np.asarray(mean_real, np.float64)
        denom = (np.linalg.norm(feat, axis=1) * np.linalg.norm(mr) + 1e-6)
        cos = feat @ mr / denom
        cos_dev = np.clip((1.0 - cos) * 3.0, 0.0, 1.0)
    return 0.6 * l2n + 0.4 * cos_dev, l2, cos_dev


def _face_signals(engine, pixels_uint8):
    """Face-crop expert escalation + retouch score (appv3.py:5429-5452):
    for each image with a detected face covering >= 8% of the frame and at
    least 96px on a side, run the FULL expert stack on the crop; all
    qualifying crops go through one batched engine call. Returns
    (face_p_fake, face_retouch) lists with None where no face qualifies."""
    from tpudf.serve.face import face_crop, face_region_retouch_score
    b = pixels_uint8.shape[0]
    p_fake = [None] * b
    retouch = [None] * b
    idx, crops = [], []
    s = int(pixels_uint8.shape[1])
    for i in range(b):
        img = pixels_uint8[i]
        c = face_crop(img)
        if c is None:
            continue
        fh, fw = c.shape[:2]
        area_ratio = (fh * fw) / float(img.shape[0] * img.shape[1])
        retouch[i] = float(face_region_retouch_score(
            np.asarray(jax.image.resize(jnp.asarray(c, jnp.float32),
                                        (256, 256, 3), "bilinear"),
                       np.float32).clip(0, 255).astype(np.uint8)))
        if area_ratio >= 0.08 and min(fh, fw) >= 96:
            idx.append(i)
            crops.append(np.asarray(jax.image.resize(
                jnp.asarray(c, jnp.float32), (s, s, 3), "bilinear"),
                np.float32).clip(0, 255).astype(np.uint8))
    if idx:
        # bucket-pad so the crop-escalation graph compiles at pow2 sizes
        # only (crop count varies per batch, unlike the main batch dim)
        face_core = engine.predict_batch(pad_to_bucket(np.stack(crops)))
        raw = np.asarray(face_core["p_fake_raw"], np.float64)[:len(idx)]
        for j, i in enumerate(idx):
            p_fake[i] = float(raw[j])
    return p_fake, retouch


def pad_to_bucket(pixels_uint8: np.ndarray, max_batch: int | None = None
                  ) -> np.ndarray:
    """Pad the batch dim up to the next power of two (capped at max_batch)
    by repeating the last image, so a serving workload compiles at most
    log2(max_batch)+1 device graphs instead of one per request count."""
    b = pixels_uint8.shape[0]
    bucket = 1 << max(0, (b - 1).bit_length())
    if max_batch is not None:
        bucket = min(bucket, max(max_batch, b))
    if bucket == b:
        return pixels_uint8
    pad = np.repeat(pixels_uint8[-1:], bucket - b, axis=0)
    return np.concatenate([pixels_uint8, pad], axis=0)


def dispatch_images(engine: DetectEngine, pixels_uint8: np.ndarray,
                    fast: bool = False, pad_batch: bool = False):
    """Phase 1 of predict_images: launch the device work and return the
    un-fetched result futures. JAX dispatch is asynchronous, so the caller
    can do host work (decode/drain the next batch) while the chip runs,
    then pass the futures to predict_images(..., _dispatched=...) to
    finalize. serve/service.DetectService uses this to hide the host
    round-trip behind the next batch's queueing.

    pad_batch=True pads the device batch to a power-of-2 bucket
    (pad_to_bucket) — predict_images slices every per-image array back to
    the true batch size, so callers see only their own images."""
    if pad_batch:
        pixels_uint8 = pad_to_bucket(np.asarray(pixels_uint8))
    core = engine.dispatch_batch(pixels_uint8, fast=fast)   # un-fetched
    x = jnp.asarray(pixels_uint8).astype(jnp.float32) / 255.0
    if x.shape[1] != 256:
        x = jax.image.resize(x, (x.shape[0], 256, 256, 3), "bilinear")
    fb = _jitted_battery()(x)
    if fast:
        render = None
    else:
        from tpudf.fuse.temporal import _jitted_render_scores
        render = _jitted_render_scores()(jnp.asarray(pixels_uint8))
    return core, fb, render


def predict_images(engine: DetectEngine, pixels_uint8: np.ndarray,
                   decision: DecisionConfig = DEFAULT_DECISION,
                   fast: bool = False, _dispatched=None) -> list[dict]:
    """pixels_uint8: (B, S, S, 3) → list of per-image report dicts."""
    core, fb, render_fut = (_dispatched if _dispatched is not None
                            else dispatch_images(engine, pixels_uint8, fast))
    # ONE blocking device_get for everything dispatch launched (core graph +
    # forensic battery + render scores) — per-tree (let alone per-leaf)
    # fetches each pay a full host<->chip round trip, which dominates
    # serving latency through a remote runtime. Then slice every per-image
    # leaf back to the true batch in case dispatch padded to a pow2 bucket.
    b = pixels_uint8.shape[0]
    core, fb, render_fut = jax.device_get((core, fb, render_fut))
    core = DetectEngine.fetch_batch(core, fast=fast)
    fb = {k: np.asarray(v)[:b] for k, v in fb.items()}
    core = {k: np.asarray(v)[:b] for k, v in core.items()}
    p_blend = np.asarray(core["p_blend"], np.float64)
    visual = np.asarray(core["visual_prob"], np.float64)
    freq = np.asarray(core["freq_prob"], np.float64)
    if fast:
        patch_mean = np.full(b, 0.5)
        max_patch = np.full(b, 0.5)
    else:
        patch_mean = np.asarray(core["patch_mean"], np.float64)
        max_patch = np.asarray(core["max_patch"], np.float64)
    patch_spread = max_patch - patch_mean

    # full-path-only host/anchored signals (appv3.py gates these on
    # `not fast_mode` too: embed :5240-5242, render :5385-5394, face :5429)
    if fast:
        embed_score = np.zeros(b)
        embed_l2 = np.zeros(b)
        embed_cos = np.zeros(b)
        render = np.zeros(b)
        face_p_fake = [None] * b
        face_retouch = [None] * b
    else:
        embed_score, embed_l2, embed_cos = _embedding_anomaly(
            core, engine.mean_real)
        render = np.asarray(render_fut, np.float64)[:b]
        face_p_fake, face_retouch = _face_signals(engine, pixels_uint8)

    # generator-likelihood vote (appv3.py:2569-2645 via :5472-5496)
    gen = np.asarray(image_generator_likelihood({
        "diffusion": jnp.asarray(fb["diffusion_v2"]),
        "perlin": jnp.asarray(fb["perlin"]),
        "texture_noise": jnp.asarray(fb["texture_noise"]),
        "render": jnp.asarray(render),
        "jpeg_q": jnp.asarray(fb["jpeg_q_mismatch"]),
        "sat_peak": jnp.asarray(fb["saturation_peak"]),
        "spectral": jnp.asarray(fb["spectral_flatness"]),
        "cfa_fake": jnp.asarray(fb["cfa_fake"]),
        "esrgan": jnp.asarray(fb["esrgan_grid"]),
        "embedding_anomaly": jnp.asarray(embed_score),
        "patch_spread": jnp.asarray(patch_spread),
        "head_delta": jnp.asarray(np.abs(visual - freq)),
        "prnu_scaled": jnp.asarray(np.clip(fb["prnu_strength"] / 0.8, 0, 1)),
        "grain_real": jnp.asarray(fb["grain"]),
        "real_prior_v4": jnp.asarray(fb["real_prior_agg"]),
        "hc_score": jnp.asarray(1.0 - fb["histogram_consistency"]),
    }))

    # v3 forensic fusion (appv3.py:2934-2951 via :5455 forensic_v2)
    forensic_score = fb["forensic_v2"].astype(np.float64)

    # XGBoost/GBDT fusion override (appv3.py:5507-5578): when a booster +
    # Platt artifact is attached, its probability replaces the core fusion
    # probability (19-d feature order matches the reference exactly)
    xgb_prob = None
    if engine.gbdt is not None and not fast:
        z_sig_v = np.asarray(core["z_sig"], np.float64)
        z_freq_v = np.asarray(core["z_freq"], np.float64)
        diff_v2 = fb["diffusion_v2"].astype(np.float64)
        cfa = fb["cfa_fake"].astype(np.float64)
        feats19 = np.stack([
            z_sig_v, z_freq_v, np.abs(z_sig_v - z_freq_v),
            visual, freq,
            np.clip(0.4 * diff_v2 + 0.6 * cfa, 0, 1),
            diff_v2,
            fb["spectral_flatness"].astype(np.float64),
            np.zeros(b),                       # edge continuity (disabled)
            fb["color_correlation"].astype(np.float64),
            fb["jpeg_residual"].astype(np.float64),
            embed_score,
            max_patch, patch_mean, patch_spread,
            cfa,
            fb["texture_noise"].astype(np.float64),
            fb["perlin"].astype(np.float64),
            np.abs(visual - freq),
        ], axis=1).astype(np.float32)
        xgb_prob = np.asarray(engine.gbdt.predict_proba(
            jnp.asarray(feats19)), np.float64)
        p_blend = xgb_prob.copy()

    bayes = jax.tree.map(np.asarray, bayesian_fuse_v2({
        "visual": jnp.asarray(visual),
        "freq": jnp.asarray(freq),
        "forensic": jnp.asarray(forensic_score),
        "cfa": jnp.asarray(fb["cfa_fake"]),
        "jpeg": jnp.asarray(fb["jpeg_q_mismatch"]),
        "prnu": jnp.asarray(1.0 - np.clip(fb["prnu_strength"] / 0.8, 0, 1)),
        "patch": jnp.asarray(patch_mean),
    }, calibration=getattr(engine, "bayes_calibration", None)))
    diri = jax.tree.map(np.asarray, dirichlet_fuse({
        "visual": jnp.asarray(visual),
        "freq": jnp.asarray(freq),
        "forensic": jnp.asarray(forensic_score),
        "cfa": jnp.asarray(fb["cfa_fake"]),
        "jpeg": jnp.asarray(fb["jpeg_q_mismatch"]),
        "patch": jnp.asarray(patch_mean),
    }))

    # hierarchical bayesian final decision (v2 engine, appv3.py:4956-5103)
    from tpudf.fuse.hierarchical import final_decision
    hb_prob, hb_label = final_decision(
        visual_prob=jnp.asarray(visual), freq_prob=jnp.asarray(freq),
        fusion_prob=jnp.asarray(p_blend),
        coral_prob=jnp.asarray(np.asarray(core["p_fake_coral"])),
        forensic_score=jnp.asarray(forensic_score),
        diff_score=jnp.asarray(fb["diffusion"]),
        max_patch=jnp.asarray(max_patch), patch_mean=jnp.asarray(patch_mean),
        head_delta=jnp.asarray(np.abs(visual - freq)),
        spectral_score=jnp.asarray(fb["spectral_flatness"]),
        color_score=jnp.asarray(fb["color_correlation"]),
        cfa_fake_score=jnp.asarray(fb["cfa_fake"]),
        real_prior=jnp.asarray(fb["real_prior_v3"]),
        fake_thresh=decision.final_fake_thresh)
    hb_prob = np.asarray(hb_prob)

    reports = []
    for i in range(b):
        p_final = float(p_blend[i])
        head_delta = abs(visual[i] - freq[i])
        prnu_scaled = float(np.clip(fb["prnu_strength"][i] / 0.8, 0, 1))

        # opt-in false-positive shield (appv3.py:3191-3208)
        if decision.use_stabilized_fusion and not fast and xgb_prob is None:
            from tpudf.fuse.decision import stabilized_fusion
            p_final = stabilized_fusion(
                float(np.asarray(core["p_fake_raw"])[i]),
                float(np.asarray(core["p_fake_coral"])[i]),
                float(visual[i]), float(freq[i]),
                float(max_patch[i]), float(patch_mean[i]))

        # diagnostics: three-way + RBR rule-table outputs (also applied
        # inside the cascade)
        three_way = classify_three_way(
            p_final, fb["real_prior_v3"][i], forensic_score[i],
            fb["cfa_fake"][i], fb["perlin"][i], fb["grain"][i],
            fb["multiscale_fft"][i], patch_mean[i], patch_spread[i],
            fb["jpeg_residual"][i], fb["histogram_consistency"][i],
            fb["texture_noise"][i])
        rbr_label, rbr_code = classify_rbr(
            p_final, fb["real_prior_v3"][i], forensic_score[i],
            fb["cfa_fake"][i], fb["perlin"][i], fb["grain"][i],
            fb["multiscale_fft"][i], patch_mean[i], patch_spread[i])

        # XGB override keeps p_global in sync (appv3.py:5576-5578)
        p_global = (float(xgb_prob[i]) if xgb_prob is not None
                    else float(np.asarray(core["p_fake_coral"])[i]))
        cascade = full_label_cascade({
            "p_final": p_final,
            "p_global": p_global,
            "patch_mean": float(patch_mean[i]),
            "patch_spread": float(patch_spread[i]),
            "head_delta": float(head_delta),
            "risk_idx": int(np.asarray(core["risk_idx"])[i]),
            "entropy": float(np.asarray(core["entropy"])[i]),
            "forensic": float(forensic_score[i]),
            "cfa_fake": float(fb["cfa_fake"][i]),
            "perlin": float(fb["perlin"][i]),
            "grain": float(fb["grain"][i]),
            "fft_conf": float(fb["multiscale_fft"][i]),
            "real_prior_v3": float(fb["real_prior_v3"][i]),
            "jpeg_resid_v3": float(fb["jpeg_residual"][i]),
            "esrgan": float(fb["esrgan_grid"][i]),
            "sat_peak": float(fb["saturation_peak"][i]),
            "jpeg_q": float(fb["jpeg_q_mismatch"][i]),
            "exposure": float(fb["exposure_variation"][i]),
            "hc": float(fb["histogram_consistency"][i]),
            "texture_noise": float(fb["texture_noise"][i]),
            "image_gen": float(gen[i]),
            "prnu_scaled": prnu_scaled,
            "visual_prob": float(visual[i]),
            "freq_prob": float(freq[i]),
            "render": float(render[i]),
            "face_p_fake": face_p_fake[i],
            "face_retouch": face_retouch[i],
        }, decision)
        final_label = cascade["label"]
        p_final = cascade["p_final"]

        report = {
            "final_label": final_label,
            "prediction_code": cascade["code"],
            "final_prob": p_final,
            "band": cascade["band"], "band_text": cascade["band_text"],
            "band_color": cascade["band_color"],
            "risk_level": cascade["risk_level"],
            "label_trace": cascade["trace"],
            "tamper_votes": cascade["tamper_votes"],
            "real_gate": cascade["real_gate"],
            "risk_idx": int(np.asarray(core["risk_idx"])[i]),
            "risk_probs": np.asarray(core["risk_probs"])[i].tolist(),
            "entropy": float(np.asarray(core["entropy"])[i]),
            "visual_head": float(visual[i]),
            "freq_head": float(freq[i]),
            "head_delta": float(head_delta),
            "z_sig": float(np.asarray(core["z_sig"])[i]),
            "z_freq": float(np.asarray(core["z_freq"])[i]),
            "p_fake_raw": float(np.asarray(core["p_fake_raw"])[i]),
            "p_fake_coral": float(np.asarray(core["p_fake_coral"])[i]),
            "patch_mean": float(patch_mean[i]),
            "max_patch": float(max_patch[i]),
            "patch_spread": float(patch_spread[i]),
            "forensic_score": float(forensic_score[i]),
            "generator_likelihood": float(gen[i]),
            "three_way": three_way,
            "rbr": rbr_label,
            "bayes_final_prob": float(hb_prob[i]),
            "bayes_final_label": str(hb_label[i]),
            "bayesian_fusion_posterior": float(bayes["posterior_fake"][i]),
            "bayesian_fusion_certainty": float(bayes["certainty"][i]),
            "dirichlet_uncertainty": float(diri["uncertainty"][i]),
            "dirichlet_conflict": float(diri["conflict"][i]),
            "jpeg_q_mismatch_score": float(fb["jpeg_q_mismatch"][i]),
            "saturation_peak_score": float(fb["saturation_peak"][i]),
            "cfa_fake_score": float(fb["cfa_fake"][i]),
            "prnu_strength_raw": float(fb["prnu_strength"][i]),
            "embedding_anomaly": float(embed_score[i]),
            "embedding_l2": float(embed_l2[i]),
            "embedding_cos_dev": float(embed_cos[i]),
            "rendering_pipeline_score": float(render[i]),
            "face_p_fake": face_p_fake[i],
            "face_retouch_score": face_retouch[i],
            "xgb_fusion_prob": (float(xgb_prob[i]) if xgb_prob is not None
                                else None),
        }
        # per-cue forensic signals
        for k, v in fb.items():
            report[f"forensic_{k}"] = float(v[i])
        if not fast:
            report["patch_probs"] = np.asarray(core["patch_probs"])[i].tolist()
        verdict = decide_verdict(report)
        report["verdict"] = {
            "label": verdict.label, "band": verdict.band,
            "risk_level": verdict.risk_level,
            "prob_fake": verdict.prob_fake,
            "certainty": verdict.certainty, "reason": verdict.reason,
        }
        reports.append(report)
    return reports


# sora escalation constants (appv3.py:163-185 defaults)
SORA_TAMPERED_THRESH = 0.15
SORA_FAKE_THRESH = 0.20
SORA_ODDS = {"low": 1.12, "med": 1.25, "high": 1.45}


def _odds(p, eps=1e-6):
    p = float(np.clip(p, eps, 1 - eps))
    return p / (1 - p)


def _from_odds(o):
    return float(o / (1 + o))


def predict_video(engine: DetectEngine, frames_uint8: np.ndarray,
                  decision: DecisionConfig = DEFAULT_DECISION,
                  agg_mode="topk_mean", strictness="balanced",
                  temporal_signals=True, flow_signals=False) -> dict:
    """frames_uint8: (T, S, S, 3) sampled frames → video-level report.
    Mirrors the video branch (appv3.py:6254-6630): fast per-frame scoring,
    aggregation, temporal/sora battery, odds-multiplier escalation, full
    analysis on the chosen frame."""
    from tpudf.fuse.temporal import (aggregate_sora, compute_temporal_signals,
                                     host_flow_signals)
    from tpudf.fuse.video_agg import (aggregate_video_probs,
                                      temporal_frame_weights)
    frame_reports = predict_images(engine, frames_uint8, decision, fast=True)
    probs = np.asarray([r["final_prob"] for r in frame_reports])
    preds = [r["final_label"] for r in frame_reports]
    diffs = np.abs(np.diff(frames_uint8.astype(np.float32), axis=0)).mean(
        axis=(1, 2, 3))
    weights = temporal_frame_weights(np.concatenate(
        [[diffs.mean() if len(diffs) else 0.0], diffs]))
    video_prob, video_label, chosen, metrics = aggregate_video_probs(
        probs, preds, agg_mode=agg_mode, strictness=strictness,
        weights=weights)

    # temporal / sora battery (device graph + optional host flow family)
    sora = {"sora_likelihood": 0.0, "temporal_consistency_score": 0.0,
            "sora_flag": False}
    signals = {}
    if temporal_signals and len(frames_uint8) >= 3:
        x = jnp.asarray(frames_uint8).astype(jnp.float32) / 255.0
        if x.shape[1] != 256:
            x = jax.image.resize(x, (x.shape[0], 256, 256, 3), "bilinear")
        embeds = None
        try:
            from tpudf.models.siglip import siglip_forward
            from tpudf.data.pipeline import normalize_siglip
            xs = jax.image.resize(
                jnp.asarray(frames_uint8).astype(jnp.float32) / 255.0,
                (len(frames_uint8), engine.cfg.image_size,
                 engine.cfg.image_size, 3), "bilinear")
            feats = siglip_forward(engine.backbone, normalize_siglip(xs),
                                   engine.cfg, engine.policy)["pooled"]
            embeds = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                              + 1e-6)
        except Exception:
            pass
        # device graph includes the dense-LK flow family (ops/flow.py);
        # NaN marks reference-gated signals (e.g. parallax when static)
        for k, v in compute_temporal_signals(x, embeds).items():
            f = float(v)
            if f == f:
                signals[k] = f
        if flow_signals:
            # optional host-cv2 flow battery (legacy cross-check; overrides
            # the device values where it produces a signal)
            signals.update(host_flow_signals(list(frames_uint8)))

        # face temporal drift family (appv3.py:3557-3755) — 22% of the
        # SORA vote; embeddings come from the engine's own tower
        from tpudf.serve import face as face_mod

        def _face_embed_fn(batch_uint8):
            from tpudf.models.siglip import siglip_forward
            from tpudf.data.pipeline import normalize_siglip
            xs = jax.image.resize(
                jnp.asarray(batch_uint8).astype(jnp.float32) / 255.0,
                (len(batch_uint8), engine.cfg.image_size,
                 engine.cfg.image_size, 3), "bilinear")
            return np.asarray(siglip_forward(
                engine.backbone, normalize_siglip(xs), engine.cfg,
                engine.policy)["pooled"])

        # landmark net (models/face_landmark.py) if cached/provided;
        # None → Haar box-geometry fallback inside each signal
        try:
            lm_params = face_mod.get_landmark_params()
        except Exception:
            lm_params = None
        for key, compute in (
                ("face_topology_drift",
                 lambda: face_mod.face_topology_drift(
                     list(frames_uint8), lm_params=lm_params)),
                ("face_embedding_drift",
                 lambda: face_mod.face_embedding_drift(
                     list(frames_uint8), _face_embed_fn,
                     lm_params=lm_params)),
                ("face_track_drift",
                 lambda: face_mod.face_track_drift(
                     list(frames_uint8), _face_embed_fn,
                     lm_params=lm_params))):
            try:
                v = compute()
            except Exception:
                v = None
            if v is not None:
                signals[key] = float(v)

        # rendering-pipeline regularity over the sampled frames (the video
        # counterpart of appv3.py:2525-2566; reported, not SORA-weighted)
        try:
            from tpudf.fuse.temporal import rendering_pipeline_score
            signals["render_regularity"] = float(
                rendering_pipeline_score(list(frames_uint8)))
        except Exception:
            pass
        sora = aggregate_sora(signals)

    # escalation cascade (appv3.py:6507-6534)
    tc = sora["temporal_consistency_score"]
    sl = sora["sora_likelihood"]
    if tc > 0.75:
        video_prob = _from_odds(_odds(video_prob) * 1.18)
    elif tc > 0.60:
        video_prob = _from_odds(_odds(video_prob) * 1.12)
    if tc > 0.70 and video_label in ("REAL", "TAMPERED", "INCONCLUSIVE"):
        video_label = "TAMPERED"
    if sl >= SORA_TAMPERED_THRESH:
        if sl >= SORA_FAKE_THRESH:
            video_prob = _from_odds(_odds(video_prob) * SORA_ODDS["high"])
        elif sl >= SORA_TAMPERED_THRESH + 0.15:
            video_prob = _from_odds(_odds(video_prob) * SORA_ODDS["med"])
        else:
            video_prob = _from_odds(_odds(video_prob) * SORA_ODDS["low"])
    if sl > SORA_FAKE_THRESH:
        video_label = "FAKE"
    elif sl >= SORA_TAMPERED_THRESH and video_label in (
            "REAL", "INCONCLUSIVE", "UNCERTAIN"):
        video_label = "TAMPERED"
    elif sora["sora_flag"] and video_label in ("REAL", "INCONCLUSIVE",
                                               "UNCERTAIN"):
        video_label = "TAMPERED"

    chosen_report = predict_images(engine, frames_uint8[chosen:chosen + 1],
                                   decision, fast=False)[0]
    # chosen-frame escalation (appv3.py:6495-6505)
    if video_label == "REAL" and chosen_report["final_label"] in (
            "TAMPERED", "FAKE"):
        video_label = chosen_report["final_label"]
        video_prob = max(video_prob, chosen_report["final_prob"])

    return {
        "video_label": video_label,
        "video_prob": float(video_prob),
        "chosen_frame": int(chosen),
        "frame_probs": probs.tolist(),
        "frame_labels": preds,
        "aggregation": metrics,
        "temporal_signals": signals,
        "sora_likelihood": sl,
        "temporal_consistency_score": tc,
        "sora_flag": sora["sora_flag"],
        "chosen_frame_report": chosen_report,
    }
