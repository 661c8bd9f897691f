"""Label-policy decision engine.

The reference's label policy is a cascade of stateful overrides spread over
appv3.py:4305-5103 and :5654-5964. Per SURVEY.md §7 ("hard parts") it is
re-implemented here as pure, ordered rule functions over a frozen threshold
config — behaviourally equivalent, unit-testable, no global state.

Components (reference anchors):
  * band_and_risk / traffic_light_label       appv3.py:4316-4342
  * real_gate / tamper_votes / real_pass      appv3.py:4578-4620
  * finalize_label_and_risk                   appv3.py:4623-4668
  * is_uncertain / is_inconclusive            appv3.py:4670-4683
  * classify_rbr (retouched-but-real, >=4/8)  appv3.py:4689-4767
  * classify_three_way (REAL/TAMPERED/FAKE)   appv3.py:4770-4846
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class DecisionConfig:
    """Env-tunable thresholds (appv3.py:142-230 defaults)."""
    final_fake_thresh: float = 0.75
    final_real_thresh: float = 0.45
    disable_tampered: bool = False
    disable_inconclusive: bool = False


DEFAULT_DECISION = DecisionConfig()

BAND_COLORS = {"GREEN": "#6ef3a5", "YELLOW": "#ffd666",
               "ORANGE": "#f59e0b", "RED": "#ff6b6b"}

LABEL_CODES = {"REAL": 0.0, "TAMPERED": 0.5, "FAKE": 1.0}


def _clamp(x, default=0.5):
    if x is None:
        return float(default)
    try:
        x = float(x)
    except Exception:
        return float(default)
    if not np.isfinite(x):
        return float(default)
    return float(np.clip(x, 0.0, 1.0))


def stabilized_fusion(raw, coral, v, f, max_patch, patch_mean):
    """False-positive shield: safer blend for REAL-looking images
    (appv3.py:3191-3208): attenuate coral/raw when the freq & visual heads
    are quiet and the patch grid is flat; soften isolated patch spikes."""
    raw = float(raw)
    coral = float(coral)
    spread = max_patch - patch_mean
    if f < 0.55 and v < 0.55 and spread < 0.18:
        coral *= 0.40
        raw *= 0.80
    if max_patch > 0.90 and f < 0.55:
        raw *= 0.90
        coral *= 0.60
    final = 0.55 * raw + 0.45 * coral
    if f < 0.45 and v < 0.50:
        final *= 0.65
    return float(np.clip(final, 0.0, 1.0))


def band_and_risk(label, p_final, forensic_score):
    if label == "FAKE":
        if forensic_score >= 0.75 or p_final >= 0.65:
            return "RED", "HIGH_FAKE"
        return "YELLOW", "LEAN_FAKE"
    if p_final <= 0.35 and forensic_score <= 0.55:
        return "GREEN", "LOW_REAL"
    return "YELLOW", "LEAN_REAL"


def traffic_light_label(label, p_final, forensic_score):
    band, risk = band_and_risk(label, p_final, forensic_score)
    text = {("GREEN", "LOW_REAL"): "GREEN - low real",
            ("YELLOW", "LEAN_REAL"): "YELLOW - lean real",
            ("YELLOW", "LEAN_FAKE"): "YELLOW - lean fake"}.get(
        (band, risk), "RED - high fake")
    return text, BAND_COLORS[band], band, risk


def real_gate(p_final, forensic, jpeg_q, hist, prnu_scaled, patch_spread):
    """Confident-REAL gate: all anomaly channels must be quiet."""
    if p_final > 0.35:
        return False
    if forensic is not None and forensic > 0.65:
        return False
    if jpeg_q is not None and jpeg_q > 0.70:
        return False
    if hist is not None and hist > 0.75:
        return False
    if prnu_scaled is not None and prnu_scaled < 0.30:
        return False
    if patch_spread is not None and patch_spread > 0.15:
        return False
    return True


def tamper_votes(forensic, jpeg_q, hist):
    votes = 0
    votes += bool(forensic is not None and forensic > 0.70)
    votes += bool(jpeg_q is not None and jpeg_q > 0.80)
    votes += bool(hist is not None and hist > 0.85)
    return votes


def real_pass(cfa_fake, prnu_scaled, real_prior_v3):
    if cfa_fake is not None and cfa_fake < 0.25 \
            and prnu_scaled is not None and prnu_scaled > 0.45:
        return True
    return real_prior_v3 is not None and real_prior_v3 > 0.65


def is_uncertain(p, risk, patch_mean, head_delta):
    return (0.45 <= p <= 0.55) and risk <= 2 and patch_mean < 0.6 \
        and head_delta >= 0.25


def is_inconclusive(p, pg, patch_mean, risk, entropy, head_delta):
    return (0.40 <= p <= 0.60 and 0.40 <= pg <= 0.60 and patch_mean < 0.75
            and risk in (1, 2) and entropy > 1.0 and head_delta >= 0.15)


def classify_rbr(fake_score, real_prior, forensic, cfa_fake, perlin, grain,
                 fft_conf, patch_mean, patch_spread):
    """REAL / RBR (retouched-but-real) / FAKE with the 8-condition vote."""
    s = _clamp(fake_score, 0.0)
    r = _clamp(real_prior, 0.0)
    f = _clamp(forensic, 0.0)
    c = _clamp(cfa_fake, 0.0)
    p = _clamp(perlin, 0.0)
    g = _clamp(grain, 0.0)
    fft = _clamp(fft_conf, 0.0)
    m = _clamp(patch_mean, 0.0)
    ps = _clamp(patch_spread, 0.0)

    if r > 0.75 and s < 0.35:
        return "REAL", 0.0
    if s > 0.75 and r < 0.30:
        return "FAKE", 1.0

    votes = sum([
        0.35 <= r <= 0.75,
        0.30 <= s <= 0.70,
        0.40 <= f <= 0.75,
        0.35 <= c <= 0.70,
        p < 0.40,
        g > 0.80,
        fft < 0.25,
        m < 0.60 and ps < 0.05,
    ])
    if votes >= 4:
        return "RBR", 0.5
    return ("FAKE", 1.0) if s >= 0.60 else ("REAL", 0.0)


def classify_three_way(fake_score, real_prior_v3, forensic_score, cfa_fake,
                       perlin, grain, fft_conf, patch_mean, patch_spread,
                       jpeg_resid, hist_consistency, texture_noise):
    """REAL / TAMPERED / FAKE rule table (appv3.py:4770-4846)."""
    s = _clamp(fake_score, 0.0)
    r = _clamp(real_prior_v3, 0.0)
    f = _clamp(forensic_score, 0.0)
    c = _clamp(cfa_fake, 0.0)
    p = _clamp(perlin, 0.0)
    g = _clamp(grain, 0.0)
    fft = bool(fft_conf)
    m = _clamp(patch_mean, 0.0)
    ps = _clamp(patch_spread, 0.0)
    j = _clamp(jpeg_resid, 0.0)
    hc = _clamp(hist_consistency, 0.0)
    t = _clamp(texture_noise, 0.0)

    # definite fake
    if s > 0.75 and r < 0.30:
        return "FAKE"
    if p > 0.80 and f > 0.60:
        return "FAKE"
    if c > 0.85:
        return "FAKE"
    # definite real
    if r > 0.70 and c < 0.25 and p < 0.40:
        return "REAL"
    if g > 0.80 and c < 0.20:
        return "REAL"
    if fft and f < 0.50:
        return "REAL"
    # tampered: moderately broken CFA + one other anomaly
    if 0.35 < c < 0.80 and (f > 0.60 or p > 0.55 or hc > 0.75 or j > 0.80
                            or ps < 0.04 or t > 0.65):
        return "TAMPERED"
    return "REAL"


def finalize_label_and_risk(label, p_fake, forensic_val, allow_real=True,
                            override_label=None,
                            cfg: DecisionConfig = DEFAULT_DECISION):
    """Consistency pass: probability↔label agreement, TAMPERED/INCONCLUSIVE
    gating, numeric code, traffic-light band (appv3.py:4623-4668).

    Returns (label, code, band_text, band_color, band, risk_level)."""
    p_fake = _clamp(p_fake)
    f = _clamp(forensic_val, 0.5)

    if override_label is not None:
        label = override_label
    elif label == "INCONCLUSIVE":
        if not cfg.disable_inconclusive:
            return label, None, "INCONCLUSIVE", "#9ca3af", "GRAY", "INCONCLUSIVE"
        label = "FAKE" if p_fake >= cfg.final_fake_thresh else "REAL"
    elif label == "UNCERTAIN":
        if not cfg.disable_inconclusive:
            return (label, None, "UNCERTAIN - low confidence", "#9ca3af",
                    "GRAY", "UNCERTAIN")
        label = "FAKE" if p_fake >= cfg.final_fake_thresh else "REAL"

    if override_label is None:
        if p_fake >= cfg.final_fake_thresh:
            label = "FAKE"
        elif p_fake <= cfg.final_real_thresh:
            label = "REAL" if allow_real else "TAMPERED"
        else:
            label = "TAMPERED"

    if cfg.disable_tampered and label in ("TAMPERED", "RBR", "RETOUCHED_REAL"):
        label = "FAKE" if p_fake >= cfg.final_fake_thresh else "REAL"
    if cfg.disable_inconclusive and label in ("INCONCLUSIVE", "UNCERTAIN"):
        label = "FAKE" if p_fake >= cfg.final_fake_thresh else "REAL"

    if label in ("TAMPERED", "RBR", "RETOUCHED_REAL"):
        label = "TAMPERED"
    code = LABEL_CODES.get(label)

    band_text, band_color, band, risk = traffic_light_label(label, p_fake, f)
    return label, code, band_text, band_color, band, risk
