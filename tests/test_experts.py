"""Expert-stack pipeline tests: freq MLP learns separable features, fusion
head converges, CORAL fit roundtrip."""

import numpy as np
import jax.numpy as jnp

from tpudf.calib.coral import CoralCutpoints, coral_blend
from tpudf.eval.metrics import roc_auc
from tpudf.models.fusion import apply_adaptive_fusion
from tpudf.train.experts import (fit_coral, train_freq_mlp,
                                 train_fusion_head)


def _separable_features(n=512, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.arange(n) % 2).astype(np.float32)
    X = rng.normal(0, 1, (n, 24)).astype(np.float32)
    X[:, 0] += y * 2.0          # one informative dimension
    X[:, 5] -= y * 1.5
    return X, y


def test_freq_mlp_v5_learns():
    X, y = _separable_features()
    params, auc = train_freq_mlp(X, y, v5=True, epochs=30,
                                 log_fn=lambda s: None)
    assert auc > 0.85


def test_freq_mlp_simple_learns():
    X, y = _separable_features(seed=1)
    params, auc = train_freq_mlp(X, y, v5=False, epochs=30,
                                 log_fn=lambda s: None)
    assert auc > 0.85


def test_fusion_head_learns_weighting():
    rng = np.random.default_rng(0)
    n = 2000
    y = (rng.random(n) > 0.5).astype(np.float32)
    z_sig = (y * 2 - 1) * 2.0 + rng.normal(0, 0.5, n)     # reliable expert
    z_freq = rng.normal(0, 2.0, n)                        # useless expert
    params = train_fusion_head(z_freq, z_sig, y, epochs=100,
                               log_fn=lambda s: None)
    z = np.asarray(apply_adaptive_fusion(
        params, jnp.asarray(z_freq, jnp.float32),
        jnp.asarray(z_sig, jnp.float32)))
    assert roc_auc(y, z) > 0.9    # learned to lean on the reliable expert


def test_fit_coral_roundtrip():
    rng = np.random.default_rng(0)
    y = (rng.random(3000) > 0.5).astype(np.float32)
    z = (y * 2 - 1) * 1.5 + rng.normal(0, 1.0, 3000)
    fit = fit_coral(z, y)
    assert len(fit.cutpoints) == 4
    assert np.all(np.diff(fit.cutpoints) >= 0)
    assert 0.25 <= fit.temperature <= 5.0
    assert fit.bins_histogram.sum() == 3000
    cuts = CoralCutpoints(tuple(fit.cutpoints), fit.temperature)
    out = coral_blend(jnp.asarray(z[:10], jnp.float32), cuts)
    assert np.isfinite(np.asarray(out["p_blend"])).all()
