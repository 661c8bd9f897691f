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


def predict_images(engine: DetectEngine, pixels_uint8: np.ndarray,
                   decision: DecisionConfig = DEFAULT_DECISION,
                   fast: bool = False) -> list[dict]:
    """pixels_uint8: (B, S, S, 3) → list of per-image report dicts."""
    core = (engine.predict_batch_fast(pixels_uint8) if fast
            else engine.predict_batch(pixels_uint8))
    x = jnp.asarray(pixels_uint8).astype(jnp.float32) / 255.0
    if x.shape[1] != 256:
        x = jax.image.resize(x, (x.shape[0], 256, 256, 3), "bilinear")
    fb = jax.tree.map(np.asarray, _jitted_battery()(x))

    b = pixels_uint8.shape[0]
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

    # generator-likelihood vote (appv3.py:5355-5505 context)
    gen = np.asarray(image_generator_likelihood({
        "diffusion": jnp.asarray(fb["diffusion"]),
        "perlin": jnp.asarray(fb["perlin"]),
        "texture_noise": jnp.asarray(fb["texture_noise"]),
        "jpeg_q": jnp.asarray(fb["jpeg_q_mismatch"]),
        "sat_peak": jnp.asarray(fb["saturation_peak"]),
        "spectral": jnp.asarray(fb["spectral_flatness"]),
        "cfa_fake": jnp.asarray(fb["cfa_fake"]),
        "esrgan": jnp.asarray(fb["esrgan_grid"]),
        "patch_spread": jnp.asarray(patch_spread),
        "prnu_scaled": jnp.asarray(np.clip(fb["prnu_strength"] / 0.8, 0, 1)),
        "grain_real": jnp.asarray(fb["grain"]),
        "real_prior_v4": jnp.asarray(fb["real_prior_agg"]),
        "hc_score": jnp.asarray(1.0 - fb["histogram_consistency"]),
    }))

    forensic_score = np.clip(0.5 * gen + 0.25 * fb["perlin"]
                             + 0.25 * fb["diffusion"], 0, 1)

    bayes = jax.tree.map(np.asarray, bayesian_fuse_v2({
        "visual": jnp.asarray(visual),
        "freq": jnp.asarray(freq),
        "forensic": jnp.asarray(forensic_score),
        "cfa": jnp.asarray(fb["cfa_fake"]),
        "jpeg": jnp.asarray(fb["jpeg_q_mismatch"]),
        "prnu": jnp.asarray(1.0 - np.clip(fb["prnu_strength"] / 0.8, 0, 1)),
        "patch": jnp.asarray(patch_mean),
    }))
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

        cascade = full_label_cascade({
            "p_final": p_final,
            "p_global": float(np.asarray(core["p_fake_coral"])[i]),
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
        signals = {k: float(v) for k, v in
                   compute_temporal_signals(x, embeds).items()}
        if flow_signals:
            signals.update(host_flow_signals(list(frames_uint8)))
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
