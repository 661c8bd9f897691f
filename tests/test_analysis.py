"""Training-analysis suite tests."""

import os

import numpy as np
import jax

from tpudf.eval.analysis import (TrainingMonitor, data_efficiency_probe,
                                 label_shuffle_probe,
                                 mc_dropout_uncertainty, overfitting_score,
                                 plot_confusion_matrix,
                                 plot_training_curves,
                                 temporal_position_analysis)


def _healthy_history(n=10):
    return [{"train_loss": 1.0 / (e + 1), "val_loss": 1.1 / (e + 1),
             "train_acc": 0.5 + 0.04 * e, "val_f1": 0.5 + 0.035 * e}
            for e in range(n)]


def _overfit_history(n=10):
    return [{"train_loss": 1.0 / (e + 1), "val_loss": 0.5 + 0.1 * e,
             "train_acc": 0.5 + 0.05 * e, "val_f1": 0.55}
            for e in range(n)]


def test_overfitting_score_direction():
    s_ok, _ = overfitting_score(_healthy_history())
    s_bad, _ = overfitting_score(_overfit_history())
    assert s_bad > s_ok
    assert s_bad > 3.0 and s_ok < 3.0


def test_training_monitor_flags(tmp_path):
    mon = TrainingMonitor(save_dir=str(tmp_path), patience=2)
    flags = {}
    for h in _overfit_history(6):
        flags = mon.update(h)
    assert flags["val_loss_rising"]
    assert os.path.exists(tmp_path / "training_curves.png")


def test_mc_dropout():
    def fwd(x, rng):
        noise = jax.random.normal(rng, (len(x),)) * 0.5
        return np.asarray(x) + np.asarray(noise)
    x = np.asarray([2.0, -2.0, 0.0])
    out = mc_dropout_uncertainty(fwd, x, n_passes=20)
    assert out["mean_prob"].shape == (3,)
    # borderline sample has the highest entropy
    assert np.argmax(out["entropy"]) == 2
    assert (out["std_prob"] > 0).all()


def test_temporal_position_analysis():
    probs = np.asarray([[0.9, 0.8, 0.2], [0.1, 0.2, 0.3]])
    out = temporal_position_analysis(probs, [1, 0])
    assert len(out["position_accuracy"]) == 3
    assert out["position_accuracy"][0] == 1.0


def test_data_efficiency_and_shuffle_probe():
    rng = np.random.default_rng(0)

    def train_eval(idx_or_labels):
        n = len(idx_or_labels)
        return 0.5 + min(n / 200.0, 0.45)     # improves with data

    out = data_efficiency_probe(train_eval, 200)
    assert out["verdict"] == "learning"

    labels = rng.integers(0, 2, 100).astype(float)
    out2 = label_shuffle_probe(lambda sl: 0.52, labels)
    assert not out2["leak_suspected"]


def test_confusion_plot(tmp_path):
    p = plot_confusion_matrix(np.asarray([[5, 1], [2, 7]]),
                              ["real", "fake"], str(tmp_path))
    assert os.path.exists(p)


# ------------------------- memorization dashboard + activation hooks


def test_activation_statistics_and_head_capture():
    from tpudf.eval.analysis import (activation_statistics,
                                     binary_head_activations)
    from tpudf.models.heads import apply_binary_head, init_binary_head

    dim = 64
    params = init_binary_head(jax.random.key(0), dim)
    feats = jax.random.normal(jax.random.key(1), (6, dim))
    acts = binary_head_activations(params, feats)
    assert set(acts) == {"se_fc1", "se_fc2", "fc1", "fc2", "fc3"}
    # final captured layer IS the head's logit
    np.testing.assert_allclose(
        np.asarray(acts["fc3"])[:, 0],
        np.asarray(apply_binary_head(params, feats)), rtol=1e-5, atol=1e-5)
    stats = activation_statistics(acts)
    assert 0.0 <= stats["activation_sparsity"] <= 1.0
    assert stats["activation_diversity"] > 0
    assert stats["feature_learning_score"] <= stats["activation_diversity"]
    # relu output of a random linear layer should be ~half-sparse
    assert stats["per_layer"]["se_fc1"]["sparsity"] > 0.2


def test_learning_memorization_metrics_directions():
    from tpudf.eval.analysis import learning_memorization_metrics

    rng = np.random.default_rng(0)
    # healthy: val tracks train, confidences match
    healthy = learning_memorization_metrics(
        _healthy_history(12),
        train_probs=rng.uniform(0.2, 0.8, 200),
        val_probs=rng.uniform(0.2, 0.8, 200),
        activation_stats={"activation_diversity": 1.0,
                          "activation_sparsity": 0.2,
                          "feature_learning_score": 0.8},
        data_efficiency={"curve": [{"auc": 0.7}, {"auc": 0.9}],
                         "verdict": "learning"})
    # memorizing: val diverges, train overconfident, weak features
    memo = learning_memorization_metrics(
        _overfit_history(12),
        train_probs=np.concatenate([np.full(100, 0.99), np.full(100, 0.01)]),
        val_probs=rng.uniform(0.35, 0.65, 200),
        activation_stats={"activation_diversity": 0.05,
                          "activation_sparsity": 0.8,
                          "feature_learning_score": 0.01},
        data_efficiency={"curve": [{"auc": 0.6}, {"auc": 0.6}],
                         "verdict": "flat"})
    assert healthy["learning_type"] == "LEARNING"
    assert memo["memorization_score"] > healthy["memorization_score"]
    assert memo["learning_type"] == "MEMORIZING"
    assert memo["overconfidence_ratio"] > 1.5
    assert 0 <= healthy["memorization_score"] <= 10


def test_memorization_dashboard_renders(tmp_path):
    from tpudf.eval.analysis import (learning_memorization_metrics,
                                     plot_memorization_dashboard)

    hist = _overfit_history(12)
    rng = np.random.default_rng(1)
    tp, vp = rng.uniform(0, 1, 50), rng.uniform(0.3, 0.7, 50)
    m = learning_memorization_metrics(hist, train_probs=tp, val_probs=vp)
    path = plot_memorization_dashboard(
        m, hist, str(tmp_path), train_probs=tp, val_probs=vp,
        n_params={"backbone": 86_000_000, "head": 500_000})
    assert os.path.exists(path) and os.path.getsize(path) > 10_000


def test_render_inference_report(tmp_path):
    from tpudf.eval.plots import render_inference_report

    rng = np.random.default_rng(2)
    labels = (np.arange(300) % 2).astype(float)
    probs = np.clip(labels * 0.5 + rng.uniform(0, 0.5, 300), 0, 1)
    out = render_inference_report(
        labels, probs, str(tmp_path),
        probs_cal=np.clip(probs * 0.9 + 0.05, 0, 1),
        methods={"base": {"accuracy": 0.81, "f1": 0.80},
                 "tta": {"accuracy": 0.84, "f1": 0.83}})
    expect = {"confusion", "confusion_normalized", "roc", "pr",
              "probability_distribution", "threshold_analysis",
              "calibration", "combined", "class_comparison", "metrics",
              "method_comparison"}
    assert set(out) == expect
    for p in out.values():
        assert os.path.exists(p) and os.path.getsize(p) > 1_000


def test_roc_pr_points_match_auc_ap():
    from tpudf.eval.metrics import average_precision, roc_auc
    from tpudf.eval.plots import pr_points, roc_points

    rng = np.random.default_rng(3)
    labels = (rng.uniform(size=400) > 0.6).astype(float)
    scores = labels + rng.normal(0, 0.8, 400)
    fpr, tpr = roc_points(labels, scores)
    auc_trap = float(np.trapezoid(tpr, fpr))
    assert abs(auc_trap - roc_auc(labels, scores)) < 1e-6
    rec, prec = pr_points(labels, scores)
    # AP = sum over recall increments of precision
    ap_step = float(np.sum(np.diff(rec) * prec[1:]))
    assert abs(ap_step - average_precision(labels, scores)) < 1e-6


def test_roc_pr_points_collapse_ties():
    """Tied scores must collapse to one curve vertex: all-equal scores plot
    as the chance diagonal (matching the midrank AUC=0.5 in the legend),
    not a per-sample staircase."""
    from tpudf.eval.metrics import roc_auc
    from tpudf.eval.plots import pr_points, roc_points

    labels = np.array([0, 1, 0, 1, 1, 0, 0, 1], float)
    scores = np.full(8, 0.5)
    fpr, tpr = roc_points(labels, scores)
    assert len(fpr) == 2 and fpr[-1] == 1.0 and tpr[-1] == 1.0
    assert abs(float(np.trapezoid(tpr, fpr)) - roc_auc(labels, scores)) < 1e-9
    rec, prec = pr_points(labels, scores)
    assert len(rec) == 2 and prec[-1] == labels.mean()

    # partial ties: trapezoid area still equals midrank AUC
    rng = np.random.default_rng(5)
    labels = (rng.uniform(size=300) > 0.5).astype(float)
    scores = np.round(labels * 0.4 + rng.uniform(size=300), 1)  # heavy ties
    fpr, tpr = roc_points(labels, scores)
    assert abs(float(np.trapezoid(tpr, fpr)) - roc_auc(labels, scores)) < 1e-9


def test_head_activation_capture_matches_apply():
    """binary/video activation capture delegates to the canonical apply_*
    functions — the recorded logits must equal the plain forward."""
    import jax
    import jax.numpy as jnp
    from tpudf.eval.analysis import (binary_head_activations,
                                     video_head_activations)
    from tpudf.models.heads import (apply_binary_head, apply_video_head,
                                    init_binary_head, init_video_head)

    k = jax.random.key(0)
    bh = init_binary_head(k, 64)
    feats = jax.random.normal(jax.random.key(1), (6, 64))
    acts = binary_head_activations(bh, feats)
    assert set(acts) >= {"se_fc1", "se_fc2", "fc1", "fc2", "fc3"}
    np.testing.assert_allclose(np.asarray(acts["fc3"][..., 0]),
                               np.asarray(apply_binary_head(bh, feats)),
                               rtol=1e-5)

    vh = init_video_head(k, 64)
    vf = jax.random.normal(jax.random.key(2), (4, 3, 64))
    vacts = video_head_activations(vh, vf)
    np.testing.assert_allclose(np.asarray(vacts["fc3"][..., 0]),
                               np.asarray(apply_video_head(vh, vf)),
                               rtol=1e-5)
