"""Metrics and statistics tests (cross-checked against sklearn where
available)."""

import numpy as np
import pytest

from tpudf.eval.metrics import (PixelAUCBuffer, average_precision,
                                binary_metrics, dice_iou, multiclass_metrics,
                                optimal_threshold,
                                precision_constrained_threshold, roc_auc,
                                sweep_mask_threshold)
from tpudf.eval.stats import (apply_isotonic, bootstrap_ci,
                              expected_calibration_error, isotonic_fit,
                              mcnemar_test, binomial_test_vs_random)


def test_auc_ap_vs_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500)
    s = rng.random(500) * 0.5 + y * 0.3
    np.testing.assert_allclose(roc_auc(y, s), sk.roc_auc_score(y, s),
                               atol=1e-10)
    np.testing.assert_allclose(average_precision(y, s),
                               sk.average_precision_score(y, s), atol=1e-10)


def test_auc_with_ties():
    y = [0, 0, 1, 1]
    s = [0.5, 0.5, 0.5, 0.9]
    sk = pytest.importorskip("sklearn.metrics")
    np.testing.assert_allclose(roc_auc(y, s), sk.roc_auc_score(y, s),
                               atol=1e-10)


def test_binary_metrics_battery():
    y = [0, 0, 1, 1, 1]
    p = [0.1, 0.7, 0.8, 0.9, 0.2]
    m = binary_metrics(y, p)
    assert m["tp"] == 2 and m["fp"] == 1 and m["fn"] == 1 and m["tn"] == 1
    assert 0 < m["f1"] < 1 and -1 <= m["mcc"] <= 1


def test_multiclass_confusion():
    y = [0, 1, 2, 2, 1]
    pred = [0, 1, 2, 1, 1]
    m = multiclass_metrics(y, pred)
    assert m["accuracy"] == 0.8
    assert m["confusion"][2, 1] == 1


def test_pixel_auc_buffer_reservoir():
    buf = PixelAUCBuffer(cap=1000, seed=0)
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = rng.integers(0, 2, 3000)
        p = y * 0.3 + rng.random(3000) * 0.7
        buf.add(p, y)
    assert buf.n_seen == 15000
    a = buf.auc()
    assert 0.6 < a < 0.95    # separable-with-overlap stream


def test_sweep_mask_threshold():
    rng = np.random.default_rng(0)
    t = (rng.random((4, 16, 16)) > 0.5).astype(np.float32)
    p = t * 0.8 + rng.random((4, 16, 16)) * 0.2
    best = sweep_mask_threshold(p, t)
    assert best["f1"] > 0.9


def test_optimal_and_constrained_thresholds():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 1000)
    p = np.clip(y * 0.6 + rng.random(1000) * 0.4, 0, 1)
    t, v = optimal_threshold(y, p, "f1")
    assert 0 < t < 1 and v > 0.7
    t2, rec = precision_constrained_threshold(y, p, 0.95)
    assert t2 is None or t2 > t - 0.5


def test_bootstrap_ci_contains_point():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 300)
    p = y * 0.4 + rng.random(300) * 0.6
    ci = bootstrap_ci(y, p, "auc", n_boot=200)
    assert ci["lo"] <= ci["point"] <= ci["hi"]


def test_significance_tests():
    assert binomial_test_vs_random(90, 100) < 1e-6
    assert binomial_test_vs_random(52, 100) > 0.5
    a = np.ones(100, bool)
    b = np.concatenate([np.ones(50, bool), np.zeros(50, bool)])
    assert mcnemar_test(a, b) < 1e-6
    assert mcnemar_test(a, a) == 1.0


def test_isotonic_monotone_and_ece():
    rng = np.random.default_rng(3)
    s = rng.random(500)
    y = (rng.random(500) < s).astype(float)
    xf, yf = isotonic_fit(s, y)
    assert (np.diff(yf) >= -1e-9).all()
    cal = apply_isotonic(xf, yf, s)
    assert expected_calibration_error(y, cal) <= \
        expected_calibration_error(y, np.clip(s * 0.5, 0, 1)) + 0.05
