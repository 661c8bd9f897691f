"""Expert-stack preparation: FreqMLP / fusion-head / CORAL fitting.

Re-designs the reference artifact pipeline (SURVEY.md §3.5):
  (2) "FreqMLP trainer.py":330-397 — train the frequency MLP on 24-d
      features (BCE, AdamW, best-AUC selection)
  (3) train_fusion_head_only.py:361-456 — precompute (z_freq, z_sig) logits
      for the corpus, then train AdaptiveFusionHead on them
  (4) coral.py:329-400 — run the full stack on a calibration set, fit
      quantile cutpoints + temperature

Feature extraction is the batched device graph (ops/fft_features.py), so
the corpus pass that takes the reference hours of per-image host FFT runs
as a handful of device batches.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpudf.calib.coral import fit_coral_cutpoints, fit_temperature
from tpudf.models.freq_mlp import (apply_freq_mlp, apply_freq_mlp_v5,
                                   fit_freq_normalizer, init_freq_mlp,
                                   init_freq_mlp_v5)
from tpudf.models.fusion import apply_adaptive_fusion, init_adaptive_fusion
from tpudf.ops.fft_features import extract_freq_vector
from tpudf.train.losses import bce_with_logits


def extract_freq_matrix(gray_batches):
    """Iterate (B, 256, 256) [0,1] grayscale batches → (N, 24) features.
    Device equivalent of extract_freq_matrix ("FreqMLP trainer.py":209)."""
    fn = jax.jit(extract_freq_vector)
    out = [np.asarray(fn(jnp.asarray(g))) for g in gray_batches]
    return np.concatenate(out, axis=0)


def train_freq_mlp(features, labels, *, v5=True, epochs=60, lr=1e-3,
                   batch_size=256, weight_decay=1e-4, seed=0, val_frac=0.15,
                   log_fn=print):
    """Train the frequency expert; returns (params, best_auc).
    Mirrors train_freq_mlp ("FreqMLP trainer.py":330-397): AdamW + BCE,
    best-AUC checkpointing on a held-out split."""
    from tpudf.eval.metrics import roc_auc
    rng = np.random.default_rng(seed)
    n = len(features)
    perm = rng.permutation(n)
    n_val = max(int(n * val_frac), 1)
    va, tr = perm[:n_val], perm[n_val:]
    X = jnp.asarray(features, jnp.float32)
    y = jnp.asarray(labels, jnp.float32)

    key = jax.random.key(seed)
    if v5:
        params = init_freq_mlp_v5(key)
        params = fit_freq_normalizer(params, X[jnp.asarray(tr)])
        apply = apply_freq_mlp_v5
    else:
        params = init_freq_mlp(key)
        apply = apply_freq_mlp

    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, rng):
        def loss_fn(p):
            z = (apply(p, xb, rng) if v5 else apply(p, xb))
            return bce_with_logits(z, yb)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    infer = jax.jit(lambda p, xb: apply(p, xb))
    best_auc, best_params = -1.0, params
    for epoch in range(epochs):
        order = rng.permutation(tr)
        losses = []
        for s in range(0, len(order), batch_size):
            idx = jnp.asarray(order[s:s + batch_size])
            params, opt_state, loss = step(
                params, opt_state, X[idx], y[idx],
                jax.random.key(epoch * 10000 + s))
            losses.append(float(loss))
        z_val = np.asarray(infer(params, X[jnp.asarray(va)]))
        auc = roc_auc(np.asarray(y)[va], z_val)
        if np.isfinite(auc) and auc > best_auc:
            best_auc, best_params = auc, jax.tree.map(jnp.copy, params)
        if epoch % 10 == 0:
            log_fn(f"[freq epoch {epoch}] loss={np.mean(losses):.4f} "
                   f"val_auc={auc:.4f} best={best_auc:.4f}")
    return best_params, best_auc


def precompute_expert_logits(z_sig_fn, freq_params, gray_batches,
                             pixel_batches, v5=False):
    """Corpus pass producing (z_freq, z_sig) pairs
    (train_fusion_head_only.py:397-400)."""
    apply = apply_freq_mlp_v5 if v5 else apply_freq_mlp
    freq_fn = jax.jit(lambda g: apply(freq_params, extract_freq_vector(g)))
    z_freqs, z_sigs = [], []
    for gray, px in zip(gray_batches, pixel_batches):
        z_freqs.append(np.asarray(freq_fn(jnp.asarray(gray))))
        z_sigs.append(np.asarray(z_sig_fn(px)))
    return np.concatenate(z_freqs), np.concatenate(z_sigs)


def train_fusion_head(z_freq, z_sig, labels, *, epochs=200, lr=5e-3,
                      batch_size=512, seed=0, log_fn=print):
    """Train AdaptiveFusionHead on precomputed logits
    (train_fusion_head_only.py:404-447)."""
    X_f = jnp.asarray(z_freq, jnp.float32)
    X_s = jnp.asarray(z_sig, jnp.float32)
    y = jnp.asarray(labels, jnp.float32)
    params = init_adaptive_fusion(jax.random.key(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, zf, zs, yb):
        def loss_fn(p):
            return bce_with_logits(apply_adaptive_fusion(p, zf, zs), yb)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(z_freq)
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n, batch_size):
            idx = jnp.asarray(order[s:s + batch_size])
            params, opt_state, loss = step(params, opt_state, X_f[idx],
                                           X_s[idx], y[idx])
            losses.append(float(loss))
        if epoch % 50 == 0:
            log_fn(f"[fusion epoch {epoch}] loss={np.mean(losses):.4f}")
    return params


@dataclasses.dataclass
class CoralFit:
    cutpoints: list
    temperature: float
    bins_histogram: np.ndarray


def fit_coral(fused_logits, labels=None, fit_temp=True) -> CoralFit:
    """Fit CORAL artifacts from calibration-set fused logits
    (coral.py:376-400): quantile cutpoints, optional NLL temperature, and
    the 50-bin histogram the reference saves as coral_bins.npy."""
    cuts = fit_coral_cutpoints(fused_logits)
    temp = 1.0
    if fit_temp and labels is not None:
        temp = fit_temperature(fused_logits, labels)
    bins = np.histogram(np.asarray(fused_logits), bins=50)[0]
    return CoralFit(cuts, temp, bins)
