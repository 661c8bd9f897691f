"""GBDT meta-fusion trainer + device TreeEnsemble evaluation tests."""

import numpy as np
import jax.numpy as jnp

from tpudf.eval.metrics import roc_auc
from tpudf.fuse.decision import stabilized_fusion
from tpudf.train.gbdt import (fit_platt, predict_margin, to_tree_ensemble,
                              train_gbdt)


def _data(n=800, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, 6))
    y = ((X[:, 0] + 0.5 * X[:, 1] * X[:, 2] > 0)).astype(np.float64)
    return X, y


def test_gbdt_learns_nonlinear():
    X, y = _data()
    Xt, yt = _data(seed=1)
    model = train_gbdt(X, y, n_trees=40)
    auc = roc_auc(yt, predict_margin(model, Xt))
    assert auc > 0.85


def test_tree_ensemble_matches_host():
    X, y = _data(300)
    model = train_gbdt(X, y, n_trees=10)
    host = predict_margin(model, X)
    ens = to_tree_ensemble(model)
    dev = np.asarray(ens.margins(jnp.asarray(X, jnp.float32)))
    np.testing.assert_allclose(dev, host, atol=1e-4, rtol=1e-4)


def test_platt_calibration():
    X, y = _data(500, seed=2)
    model = train_gbdt(X, y, n_trees=30)
    z = predict_margin(model, X)
    a, b = fit_platt(z, y)
    p = 1 / (1 + np.exp(-(a * z + b)))
    # calibrated mean prob should approximate the base rate
    assert abs(p.mean() - y.mean()) < 0.05


def test_stabilized_fusion_shield():
    # quiet heads + flat patches → attenuated
    soft = stabilized_fusion(0.6, 0.6, v=0.3, f=0.3, max_patch=0.5,
                             patch_mean=0.45)
    hard = stabilized_fusion(0.6, 0.6, v=0.9, f=0.9, max_patch=0.95,
                             patch_mean=0.5)
    assert soft < hard
    assert 0 <= soft <= 1
