"""Training losses: classification + segmentation families.

JAX re-implementations of the reference loss battery
(siglip2siddataset.py:69-181 seg losses; BCE-with-pos-weight
hidf_video_classifier.py:2934-2940; mixup cifake).

Morphology (dilate/erode for boundary-aware and consistency losses) is done
with max-pool / min-pool reduce-windows — the XLA-native equivalent of the
reference's Kornia morphological ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, pos_weight=None):
    """Mean binary cross-entropy from logits (torch BCEWithLogitsLoss
    semantics incl. pos_weight)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    w_pos = pos_weight if pos_weight is not None else 1.0
    loss = -(w_pos * targets * log_p + (1.0 - targets) * log_np)
    return jnp.mean(loss)


def softmax_ce(logits, labels, num_classes=None, label_smoothing=0.0):
    """Mean cross-entropy over integer labels."""
    nc = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, nc)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Binary focal loss (siglip2siddataset.py:69-77)."""
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(alpha_t * (1 - p_t) ** gamma * ce)


def _pool(x, kernel_size, op):
    """Grayscale morphology via reduce_window over (..., H, W)."""
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    pad = kernel_size // 2
    nd = x.ndim
    dims = [1] * (nd - 2) + [kernel_size, kernel_size]
    strides = [1] * nd
    padding = [(0, 0)] * (nd - 2) + [(pad, pad), (pad, pad)]
    return jax.lax.reduce_window(x, init, fn, dims, strides, padding)


def dilate(x, kernel_size=3):
    return _pool(x, kernel_size, "max")


def erode(x, kernel_size=3):
    return _pool(x, kernel_size, "min")


def opening(x, kernel_size=3):
    return dilate(erode(x, kernel_size), kernel_size)


def closing(x, kernel_size=3):
    return erode(dilate(x, kernel_size), kernel_size)


def boundary_aware_loss(logits, targets, kernel_size=3):
    """BCE with 4x weight on the morphological boundary band
    (siglip2siddataset.py:98-116)."""
    boundary = jax.lax.stop_gradient(
        dilate(targets, kernel_size) - erode(targets, kernel_size))
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    return jnp.mean(ce * (1.0 + 3.0 * boundary))


def morphological_loss(logits, targets, kernel_size=3):
    """Opening/closing consistency MSE (siglip2siddataset.py:118-140)."""
    p = jax.nn.sigmoid(logits)
    o = jnp.mean((opening(p, kernel_size) - opening(targets, kernel_size)) ** 2)
    c = jnp.mean((closing(p, kernel_size) - closing(targets, kernel_size)) ** 2)
    return (o + c) / 2


def iou_loss(logits, targets, smooth=1e-6):
    """1 - soft IoU (siglip2siddataset.py:142-148)."""
    p = jax.nn.sigmoid(logits)
    axes = tuple(range(1, p.ndim))
    inter = jnp.sum(p * targets, axes)
    union = jnp.sum(p, axes) + jnp.sum(targets, axes) - inter + smooth
    return 1.0 - jnp.mean(inter / union)


def dice_loss(logits, targets, eps=1e-6):
    p = jax.nn.sigmoid(logits)
    axes = tuple(range(1, p.ndim))
    inter = jnp.sum(p * targets, axes)
    denom = jnp.sum(p, axes) + jnp.sum(targets, axes) + eps
    return 1.0 - jnp.mean(2 * inter / denom)


def bce_dice_loss(logits, targets, bce_w=1.0, dice_w=0.5):
    """Legacy BCE+Dice (siglip2siddataset.py:174-181)."""
    return bce_w * bce_with_logits(logits, targets) + dice_w * dice_loss(logits, targets)


def combined_segmentation_loss(logits, targets, bce_w=0.4, focal_w=0.3,
                               dice_w=0.5, boundary_w=0.4, iou_w=0.4,
                               morph_w=0.2):
    """Six-component seg loss (siglip2siddataset.py:150-172)."""
    return (bce_w * bce_with_logits(logits, targets)
            + focal_w * focal_loss(logits, targets)
            + dice_w * dice_loss(logits, targets)
            + boundary_w * boundary_aware_loss(logits, targets)
            + iou_w * iou_loss(logits, targets)
            + morph_w * morphological_loss(logits, targets))


def dice_iou_from_logits(logits, targets, thr=0.5, eps=1e-6):
    """Per-sample hard dice/IoU at threshold (siglip2siddataset.py:183-189)."""
    p = (jax.nn.sigmoid(logits) > thr).astype(jnp.float32)
    axes = tuple(range(1, p.ndim))
    inter = jnp.sum(p * targets, axes)
    union = jnp.sum(p + targets - p * targets, axes) + eps
    dice = 2 * inter / (jnp.sum(p, axes) + jnp.sum(targets, axes) + eps)
    return dice, inter / union, p


def mixup(rng, x, y, alpha=0.2):
    """Mixup augmentation (cifake_binary_classifier.py training loop):
    beta-interpolated inputs + labels. Returns (x', y', lam)."""
    r1, r2 = jax.random.split(rng)
    lam = jax.random.beta(r1, alpha, alpha)
    perm = jax.random.permutation(r2, x.shape[0])
    xm = lam * x + (1 - lam) * x[perm]
    ym = lam * y + (1 - lam) * y[perm]
    return xm, ym, lam
