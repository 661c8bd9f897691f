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
