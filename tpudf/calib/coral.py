"""CORAL ordinal risk calibration.

Re-implements the reference's 5-band ordinal calibrator as vectorized JAX:
  * inference: sigmoid differences over 4 cutpoints → ordinal distribution
    over [REAL, LEAN_REAL, BORDERLINE, LEAN_FAKE, FAKE] (appv3.py:3154-3184),
    plus the smoothed "gaussian" fake probability mu/4 + 0.5*var and entropy
    diagnostics (appv3.py:3262-3291)
  * fitting: quantile scan at 15/35/55/75% of sorted fused logits
    (coral.py:300-322)

Unlike the reference (per-image scalar loop), everything here is batched —
(B,) logits in, (B, 5) ordinal distributions out — so CORAL fuses into the
jitted inference graph.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

RISK_NAMES = ["REAL", "LEAN_REAL", "BORDERLINE", "LEAN_FAKE", "FAKE"]


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


@dataclasses.dataclass(frozen=True)
class CoralCutpoints:
    """Cutpoints in logit space + fused-logit temperature."""
    cuts: tuple  # 4 floats, ascending
    temperature: float = 1.0

    @classmethod
    def from_prob_cuts(cls, q25, q50, q75, qmax, temperature=1.0):
        """From probability-space cutpoints as shipped in
        siglip/coral_cutpoints.json (appv3.py:3155-3162)."""
        return cls(tuple(_logit(np.array([q25, q50, q75, qmax]))), temperature)

    @classmethod
    def from_json(cls, cut_path, temp_path=None):
        with open(cut_path) as f:
            raw = json.load(f)
        if isinstance(raw, dict):
            cuts = [raw["q25"], raw["q50"], raw["q75"], raw["max"]]
        else:
            cuts = list(raw)
        t = 1.0
        if temp_path is not None:
            with open(temp_path) as f:
                t = float(json.load(f).get("temperature", 1.0))
        return cls.from_prob_cuts(*cuts, temperature=t)

    @classmethod
    def default(cls):
        # fallback cutpoints (appv3.py:3163)
        return cls.from_prob_cuts(0.32, 0.47, 0.61, 0.75)


def coral_probs(z_scaled, cuts: CoralCutpoints):
    """(…,) scaled fused logits → (…, 5) ordinal distribution."""
    c = jnp.asarray(cuts.cuts, jnp.float32)
    g = jax.nn.sigmoid(z_scaled[..., None] - c)           # (…, 4)
    p = jnp.concatenate([
        (1.0 - g[..., :1]),
        g[..., :-1] - g[..., 1:],
        g[..., -1:],
    ], axis=-1)
    return p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-8)


def coral_gauss_prob(risk_probs):
    """Smoothed fake probability from the ordinal distribution:
    clip(mu/4 + 0.5*var) (appv3.py:3267-3272). Also returns entropy."""
    k = jnp.arange(5, dtype=jnp.float32)
    mu = jnp.sum(k * risk_probs, axis=-1)
    var = jnp.sum(risk_probs * (k - mu[..., None]) ** 2, axis=-1)
    p = jnp.clip(mu / 4.0 + 0.5 * var, 0.0, 1.0)
    ent = -jnp.sum(risk_probs * jnp.log(risk_probs + 1e-8), axis=-1)
    return p, ent


def coral_blend(z_fused, cuts: CoralCutpoints):
    """Full detect_core CORAL path (appv3.py:3256-3291): temperature-scale
    the fused logit, raw sigmoid prob, ordinal probs, gaussian smoothing,
    conservative 0.70/0.30 blend. Returns a dict of (…,)-shaped signals."""
    z_scaled = z_fused / max(cuts.temperature, 1e-3)
    p_raw = jax.nn.sigmoid(z_scaled)
    rp = coral_probs(z_scaled, cuts)
    p_gauss, ent = coral_gauss_prob(rp)
    p_blend = jnp.clip(0.70 * p_raw + 0.30 * p_gauss, 0.0, 1.0)
    return {
        "z_scaled": z_scaled,
        "p_fake_raw": p_raw,
        "risk_probs": rp,
        "risk_idx": jnp.argmax(rp, axis=-1),
        "p_fake_coral": p_gauss,
        "entropy": ent,
        "p_blend": p_blend,
    }


def moe_fallback_blend(p_sig, p_freq, p_gauss):
    """Head-less "MoE" probability-space fusion — the blend the reference
    apps fall back to when the 2→1 fusion head artifact is missing
    (deepfake-detector-v2/app.py:1380-1390, appv3.py:3278-3287): noisy-OR of
    the two experts + confidence-weighted expert mixture, with the CORAL
    gaussian prob capped at a 25% share so it "never dominates"."""
    p_or = 1.0 - (1.0 - p_sig) * (1.0 - p_freq)
    alpha = jnp.clip(p_sig * (1.0 - p_freq), 0.05, 0.95)
    beta = jnp.clip(p_freq * (1.0 - p_sig), 0.05, 0.95)
    p_moe = (alpha * p_sig + beta * p_freq) / (alpha + beta + 1e-6)
    return jnp.clip(0.4 * p_or + 0.35 * p_moe + 0.25 * p_gauss, 0.0, 1.0)


def fit_coral_cutpoints(fused_logits, quantiles=(0.15, 0.35, 0.55, 0.75)):
    """Quantile-scan fit over calibration-set fused logits (coral.py:300-322).
    Returns cutpoint values in the same space as the input logits."""
    z = np.sort(np.asarray(fused_logits))
    return [float(z[int(q * len(z))]) for q in quantiles]


def fit_temperature(logits, labels, grid=None):
    """1-D temperature search minimizing NLL (reference temperature-scaling
    analogue, inference_deepfakeface_complete.py:450-478)."""
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels, np.float64)
    if grid is None:
        grid = np.linspace(0.25, 5.0, 96)
    best_t, best_nll = 1.0, np.inf
    for t in grid:
        p = 1.0 / (1.0 + np.exp(-logits / t))
        p = np.clip(p, 1e-7, 1 - 1e-7)
        nll = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
        if nll < best_nll:
            best_t, best_nll = float(t), float(nll)
    return best_t
