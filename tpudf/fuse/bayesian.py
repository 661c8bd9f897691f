"""Bayesian evidence fusion over the multi-cue expert signals.

JAX re-implementations of the reference fusers (appv3.py:932-1094), batched:
  * bayesian_fuse_v2 — reliability-weighted clipped log-odds sum over the 7
    cue probabilities (visual/freq/forensic/cfa/jpeg/prnu/patch) + prior,
    with the PRNU<0.4 real-tilt and agreement-based certainty
  * dirichlet_fuse — per-cue Dirichlet pseudo-counts → posterior + epistemic/
    aleatoric uncertainty + conflict; the uncertainty guard feeds the
    INCONCLUSIVE label (appv3.py:5654-5659)

Both take a dict of (B,)-shaped cue probabilities. Missing-cue semantics
mirror the reference exactly: bayesian_fuse_v2 fills missing/non-finite
cues with the neutral 0.5 (appv3.py:995-999), while dirichlet_fuse SKIPS
absent cues entirely so they contribute no pseudo-counts
(appv3.py:1069-1071) — the two fusers intentionally differ.

Calibration hooks (appv3.py:948-975): `fit_bayes_calibration` fits either
per-feature isotonic maps (applied inside bayesian_fuse_v2 before the
log-odds sum, like the reference's calibrate=True path) or a logistic
model over the 7-feature vector (the reference fits this but never applies
it inside fuse(); we additionally expose it as `logistic_posterior`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

FEATURES = ("visual", "freq", "forensic", "cfa", "jpeg", "prnu", "patch")

RELIABILITY = {
    "visual": 0.6, "freq": 0.6, "forensic": 1.0, "cfa": 0.9,
    "jpeg": 0.7, "prnu": 0.7, "patch": 0.8,
}

DIRICHLET_WEIGHTS = {
    "visual": 1.0, "freq": 1.0, "forensic": 1.2, "cfa": 0.9,
    "jpeg": 0.8, "prnu": 0.7, "patch": 0.9,
}

_EPS = 1e-6


def _batch_shape(features):
    """Batch shape from the first present cue (a leading None value must
    not poison the shape derivation — None is a valid 'missing cue')."""
    for v in features.values():
        if v is not None:
            return jnp.shape(jnp.asarray(v))
    return ()


def _gather(features, batch_shape):
    """dict → (B, 7) with 0.5 fill for missing/non-finite cues."""
    cols = []
    for name in FEATURES:
        v = features.get(name)
        if v is None:
            v = jnp.full(batch_shape, 0.5)
        v = jnp.asarray(v, jnp.float32)
        v = jnp.where(jnp.isfinite(v), v, 0.5)
        cols.append(v)
    return jnp.stack(cols, axis=-1)


@dataclasses.dataclass
class BayesCalibration:
    """Fitted recalibration for bayesian_fuse_v2 (appv3.py:948-975).

    iso:      {feature: (x_fit, y_fit)} isotonic maps, applied per feature
              before the log-odds sum (jnp.interp — stays jittable)
    logistic: (w (7,), b) over the 7-feature vector; optional extra output
    """
    iso: dict | None = None
    logistic: tuple | None = None

    def to_json(self):
        out = {}
        if self.iso:
            out["iso"] = {k: [np.asarray(x).tolist(), np.asarray(y).tolist()]
                          for k, (x, y) in self.iso.items()}
        if self.logistic:
            w, b = self.logistic
            out["logistic"] = {"w": np.asarray(w).tolist(), "b": float(b)}
        return out

    @classmethod
    def from_json(cls, d):
        iso = {k: (np.asarray(x), np.asarray(y))
               for k, (x, y) in d.get("iso", {}).items()} or None
        lg = d.get("logistic")
        logistic = (np.asarray(lg["w"]), float(lg["b"])) if lg else None
        return cls(iso=iso, logistic=logistic)


def fit_bayes_calibration(features: dict, labels, mode="isotonic",
                          iters=1500, lr=2.0) -> BayesCalibration:
    """Fit the optional recalibration from held-out cue probabilities.

    features: dict of (N,) arrays (any subset of FEATURES), labels: (N,)
    0=real / 1=fake. mode: "isotonic" (per-feature, the reference's
    calibrate=True) or "logistic" (joint 7-feature model)."""
    from tpudf.eval.stats import isotonic_fit
    y = np.asarray(labels, np.float64)
    if mode == "isotonic":
        iso = {}
        for name in FEATURES:
            if name in features and features[name] is not None:
                iso[name] = isotonic_fit(
                    np.asarray(features[name], np.float64), y)
        return BayesCalibration(iso=iso)
    if mode == "logistic":
        # None-valued cues count as missing (= 0.5), matching _gather and
        # the isotonic branch's feature-dict contract
        x = np.column_stack([
            np.asarray(features[name], np.float64)
            if features.get(name) is not None else np.full_like(y, 0.5)
            for name in FEATURES])
        w = np.zeros(len(FEATURES))
        b = 0.0
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
            g = p - y
            w -= lr * (x.T @ g) / len(y)
            b -= lr * float(np.mean(g))
        return BayesCalibration(logistic=(w, b))
    raise ValueError(f"unknown calibration mode {mode!r}")


def bayesian_fuse_v2(features: dict, prior_fake=0.5,
                     calibration: BayesCalibration | None = None):
    """features: dict of (B,) probabilities → dict of (B,) outputs."""
    p = jnp.clip(_gather(features, _batch_shape(features)), _EPS, 1 - _EPS)
    if calibration is not None and calibration.iso:
        cols = []
        for i, name in enumerate(FEATURES):
            col = p[..., i]
            if name in calibration.iso:
                xf, yf = calibration.iso[name]
                col = jnp.interp(col, jnp.asarray(xf, jnp.float32),
                                 jnp.asarray(yf, jnp.float32))
            cols.append(col)
        p = jnp.clip(jnp.stack(cols, axis=-1), _EPS, 1 - _EPS)
    w = jnp.asarray([RELIABILITY[k] for k in FEATURES])
    log_terms = jnp.clip(w * jnp.log(p / (1 - p)), -2.0, 2.0)
    log_odds = jnp.sum(log_terms, axis=-1)

    prnu = p[..., FEATURES.index("prnu")]
    log_odds = log_odds + jnp.where(prnu < 0.4, math.log(0.5), 0.0)

    prior = jnp.clip(jnp.asarray(prior_fake, jnp.float32), _EPS, 1 - _EPS)
    log_post = log_odds + jnp.log(prior / (1 - prior))
    posterior = jax.nn.sigmoid(log_post)

    mean_p = jnp.mean(p, axis=-1)
    std_p = jnp.std(p, axis=-1)
    agreement = 1.0 - jnp.tanh(std_p * 2.0)
    certainty = jnp.clip(
        agreement * (0.5 + jnp.abs(0.5 - posterior) * 2.0), 0.0, 1.0)

    out = {
        "posterior_fake": posterior,
        "posterior_real": 1.0 - posterior,
        "certainty": certainty,
        "log_odds": log_post,
        "mean_prob": mean_p,
        "std_prob": std_p,
        # per-cue (clipped, possibly isotonic-recalibrated) probabilities —
        # the reference returns these as `calibrated` and the verdict's
        # benign-JPEG penalty consumes the jpeg entry (appv3.py:1033,
        # 5936-5937, 4412)
        "calibrated": {name: p[..., i] for i, name in enumerate(FEATURES)},
    }
    if calibration is not None and calibration.logistic is not None:
        lw, lb = calibration.logistic
        out["logistic_posterior"] = jax.nn.sigmoid(
            p @ jnp.asarray(lw, jnp.float32) + float(lb))
    return out


def dirichlet_fuse(features: dict, base_strength=3.0):
    """Absent/None cues are SKIPPED (no pseudo-counts), matching the
    reference's `if k not in features: continue` (appv3.py:1069-1071).
    An all-missing dict returns the neutral Dirichlet(1,1) posterior
    instead of the reference's 0/0 NaN (safety guard; that path is
    unreachable in the reference's own serving code)."""
    batch_shape = _batch_shape(features)
    alpha_real = jnp.zeros(batch_shape)
    alpha_fake = jnp.zeros(batch_shape)
    present = 0
    for k, w in DIRICHLET_WEIGHTS.items():
        if k not in features or features[k] is None:
            continue
        present += 1
        p = jnp.clip(jnp.asarray(features[k], jnp.float32), _EPS, 1 - _EPS)
        p = jnp.where(jnp.isfinite(p), p, 0.5)
        alpha_fake = alpha_fake + w * p * base_strength + 1.0
        alpha_real = alpha_real + w * (1 - p) * base_strength + 1.0
    if present == 0:
        alpha_real = alpha_fake = jnp.ones(batch_shape)

    s = alpha_real + alpha_fake
    mean_fake = alpha_fake / s
    epistemic = 2.0 / s
    aleatoric = mean_fake * (1 - mean_fake)
    return {
        "posterior_fake": mean_fake,
        "posterior_real": alpha_real / s,
        "alpha_real": alpha_real,
        "alpha_fake": alpha_fake,
        "total_strength": s,
        "uncertainty": jnp.clip(epistemic + aleatoric, 0.0, 1.0),
        "conflict": jnp.abs(alpha_real - alpha_fake) / s,
    }
