"""Training-analysis suite: overfitting diagnostics, MC-dropout uncertainty,
learning-vs-memorization probes, publication plots.

Quantitative re-design of the reference's analysis battery:
  * overfitting 0-10 score dashboard      (hidf_video_classifier.py:1563-2033)
  * RealTimeTrainingMonitor trend detector (cifake_binary_classifier.py:286-573)
  * MC-dropout uncertainty (train-mode, N passes) (hidf :1012-1141)
  * per-frame-position temporal analysis  (hidf :1142-1230)
  * learning-vs-memorization probes: data-efficiency curve + shuffled-label
    memorization check                    (hidf :2034-2804)
  * training-curve / confusion-matrix plots (matplotlib, saved to disk)
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

from tpudf.eval.metrics import binary_metrics, roc_auc


# ----------------------------------------------------------- overfitting

def overfitting_score(history: Sequence[dict],
                      train_key="train_loss", val_key="val_loss",
                      train_acc_key="train_acc", val_acc_key="val_f1"):
    """0-10 overfitting severity from the epoch history (0 = healthy).

    Components (hidf dashboard semantics): generalization gap size & growth,
    val-loss divergence (val rising while train falls), and val-metric
    stagnation vs train improvement.
    """
    tr = [h[train_key] for h in history if train_key in h]
    va = [h[val_key] for h in history if val_key in h]
    score = 0.0
    detail = {}
    if len(tr) >= 3 and len(va) >= 3:
        gap = np.asarray(va[-3:]).mean() - np.asarray(tr[-3:]).mean()
        rel_gap = gap / (abs(np.asarray(tr[-3:]).mean()) + 1e-8)
        detail["loss_gap"] = float(gap)
        score += float(np.clip(rel_gap * 4.0, 0, 3))
        # divergence: val slope up, train slope down
        v_slope = np.polyfit(np.arange(len(va)), va, 1)[0]
        t_slope = np.polyfit(np.arange(len(tr)), tr, 1)[0]
        detail["val_slope"] = float(v_slope)
        detail["train_slope"] = float(t_slope)
        if v_slope > 0 and t_slope < 0:
            score += float(np.clip(v_slope / (abs(t_slope) + 1e-8), 0, 4))
    ta = [h[train_acc_key] for h in history if train_acc_key in h]
    vf = [h[val_acc_key] for h in history if val_acc_key in h]
    if len(ta) >= 3 and len(vf) >= 3:
        acc_gap = np.asarray(ta[-3:]).mean() - np.asarray(vf[-3:]).mean()
        detail["metric_gap"] = float(acc_gap)
        score += float(np.clip(acc_gap * 10.0, 0, 3))
    return float(np.clip(score, 0.0, 10.0)), detail


class TrainingMonitor:
    """Live trend-based overfitting detector
    (cifake RealTimeTrainingMonitor :286-573): keeps the history, flags when
    val loss has risen for `patience` consecutive epochs while train falls,
    and renders live curves."""

    def __init__(self, save_dir=None, patience=3):
        self.history: list[dict] = []
        self.save_dir = save_dir
        self.patience = patience

    def update(self, epoch_metrics: dict) -> dict:
        self.history.append(dict(epoch_metrics))
        score, detail = overfitting_score(self.history)
        flags = {"overfitting_score": score, **detail}
        va = [h.get("val_loss") for h in self.history
              if h.get("val_loss") is not None]
        if len(va) > self.patience:
            rising = all(va[-i] > va[-i - 1]
                         for i in range(1, self.patience + 1))
            flags["val_loss_rising"] = bool(rising)
        if self.save_dir:
            plot_training_curves(self.history, self.save_dir)
        return flags


# ------------------------------------------------------------ mc dropout

def mc_dropout_uncertainty(forward_with_rng: Callable, inputs, n_passes=10,
                           seed=0):
    """Run a dropout-active forward N times (explicit PRNG keys) and report
    per-sample mean prob, std, and predictive entropy (hidf :1012-1141).

    forward_with_rng(inputs, rng) must return logits (B,)."""
    import jax
    probs = []
    for i in range(n_passes):
        z = forward_with_rng(inputs, jax.random.key(seed * 1000 + i))
        probs.append(1.0 / (1.0 + np.exp(-np.asarray(z, np.float64))))
    p = np.stack(probs)                       # (N, B)
    mean = p.mean(0)
    std = p.std(0)
    eps = 1e-9
    entropy = -(mean * np.log(mean + eps)
                + (1 - mean) * np.log(1 - mean + eps))
    return {"mean_prob": mean, "std_prob": std, "entropy": entropy,
            "n_passes": n_passes}


# -------------------------------------------------- temporal position

def temporal_position_analysis(per_frame_probs, labels, thr=0.5):
    """Per-frame-position accuracy/confidence (hidf :1142-1230).
    per_frame_probs: (N, T) per-video per-position fake probs."""
    p = np.asarray(per_frame_probs)
    y = np.asarray(labels)[:, None]
    correct = ((p >= thr) == (y > 0.5)).astype(np.float64)
    return {"position_accuracy": correct.mean(0).tolist(),
            "position_mean_prob": p.mean(0).tolist(),
            "position_std_prob": p.std(0).tolist()}


# --------------------------------------------- learning vs memorization

def data_efficiency_probe(train_eval_fn: Callable[[np.ndarray], float],
                          n_train: int, fractions=(0.1, 0.25, 0.5, 1.0),
                          seed=0):
    """AUC as a function of training-set size. A memorizing model is flat or
    degrades; a learning model improves with data (hidf learning-vs-
    memorization 16-panel core). train_eval_fn(indices) → val AUC."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_train)
    out = []
    for f in fractions:
        k = max(int(n_train * f), 2)
        out.append({"fraction": f, "n": k,
                    "auc": float(train_eval_fn(perm[:k]))})
    aucs = [o["auc"] for o in out]
    verdict = "learning" if aucs[-1] > aucs[0] + 0.02 else (
        "flat" if abs(aucs[-1] - aucs[0]) <= 0.02 else "memorizing")
    return {"curve": out, "verdict": verdict}


def label_shuffle_probe(train_eval_fn: Callable[[np.ndarray], float],
                        labels: np.ndarray, seed=0):
    """Fit with shuffled labels: val AUC should collapse to ~0.5 for a
    generalizing pipeline; far above 0.5 implies leakage/memorization."""
    rng = np.random.default_rng(seed)
    shuffled = labels.copy()
    rng.shuffle(shuffled)
    auc = float(train_eval_fn(shuffled))
    return {"shuffled_label_auc": auc,
            "leak_suspected": bool(auc > 0.65)}


# ------------------------------------------------------------------ plots

def plot_training_curves(history, save_dir, name="training_curves.png"):
    """Loss/metric curves (siglip2siddataset.py:396-480 analogue)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(save_dir, exist_ok=True)
    keys = sorted({k for h in history for k in h
                   if isinstance(h.get(k), (int, float))
                   and k not in ("epoch",)})
    loss_keys = [k for k in keys if "loss" in k]
    met_keys = [k for k in keys if "loss" not in k and "time" not in k]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    xs = np.arange(len(history))
    for k in loss_keys:
        ys = [h.get(k, np.nan) for h in history]
        axes[0].plot(xs, ys, label=k)
    axes[0].set_title("losses")
    axes[0].legend(fontsize=7)
    for k in met_keys:
        ys = [h.get(k, np.nan) for h in history]
        axes[1].plot(xs, ys, label=k)
    axes[1].set_title("metrics")
    axes[1].legend(fontsize=7)
    path = os.path.join(save_dir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_confusion_matrix(cm, class_names, save_dir, name="confusion.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(save_dir, exist_ok=True)
    cm = np.asarray(cm)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(cm, cmap="Blues")
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    fontsize=9)
    ax.set_xticks(range(len(class_names)), class_names, fontsize=8)
    ax.set_yticks(range(len(class_names)), class_names, fontsize=8)
    ax.set_xlabel("pred")
    ax.set_ylabel("true")
    path = os.path.join(save_dir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
