"""Bayesian evidence fusion over the multi-cue expert signals.

JAX re-implementations of the reference fusers (appv3.py:932-1094), batched:
  * bayesian_fuse_v2 — reliability-weighted clipped log-odds sum over the 7
    cue probabilities (visual/freq/forensic/cfa/jpeg/prnu/patch) + prior,
    with the PRNU<0.4 real-tilt and agreement-based certainty
  * dirichlet_fuse — per-cue Dirichlet pseudo-counts → posterior + epistemic/
    aleatoric uncertainty + conflict; the uncertainty guard feeds the
    INCONCLUSIVE label (appv3.py:5654-5659)

Both take a dict of (B,)-shaped cue probabilities; missing cues default to
the neutral 0.5 (same semantics as the reference's fill-in).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

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


def bayesian_fuse_v2(features: dict, prior_fake=0.5):
    """features: dict of (B,) probabilities → dict of (B,) outputs."""
    some = next(iter(features.values()))
    p = jnp.clip(_gather(features, jnp.shape(some)), _EPS, 1 - _EPS)
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

    return {
        "posterior_fake": posterior,
        "posterior_real": 1.0 - posterior,
        "certainty": certainty,
        "log_odds": log_post,
        "mean_prob": mean_p,
        "std_prob": std_p,
    }


def dirichlet_fuse(features: dict, base_strength=3.0):
    some = next(iter(features.values()))
    batch_shape = jnp.shape(some)
    alpha_real = jnp.zeros(batch_shape)
    alpha_fake = jnp.zeros(batch_shape)
    for k, w in DIRICHLET_WEIGHTS.items():
        if k not in features or features[k] is None:
            continue
        p = jnp.clip(jnp.asarray(features[k], jnp.float32), _EPS, 1 - _EPS)
        p = jnp.where(jnp.isfinite(p), p, 0.5)
        alpha_fake = alpha_fake + w * p * base_strength + 1.0
        alpha_real = alpha_real + w * (1 - p) * base_strength + 1.0

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
