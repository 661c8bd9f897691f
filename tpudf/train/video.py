"""HiDF video classifier training: batched frame-axis ViT + temporal head.

Re-designs hidf_video_classifier.py:370-428 + main (:2805-3121): the (B, T)
frame axis folds into the batch for one ViT call (the reference's
B·T reshape, :304), frozen backbone by default (:2913-2916), BCE with auto
pos_weight (:2934-2940), warmup-cosine schedule, grad clip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.heads import apply_video_head
from tpudf.models.siglip import SigLIPConfig, siglip_forward
from tpudf.train.losses import bce_with_logits


def video_frame_features(backbone_params, frames, cfg: SigLIPConfig,
                         policy=DEFAULT_POLICY):
    """frames: (B, T, S, S, 3) normalized → (B, T, W) pooled features via ONE
    folded ViT forward."""
    b, t = frames.shape[:2]
    flat = frames.reshape((b * t,) + frames.shape[2:])
    feats = siglip_forward(backbone_params, flat, cfg, policy)["pooled"]
    return feats.reshape(b, t, -1)


def video_forward(backbone_params, head_params, frames, cfg, policy,
                  rng=None, freeze_backbone=True):
    feats = video_frame_features(backbone_params, frames, cfg, policy)
    if freeze_backbone:
        feats = jax.lax.stop_gradient(feats)
    return apply_video_head(head_params, feats, rng=rng)


def auto_pos_weight(labels):
    """n_neg / n_pos BCE pos_weight (hidf :2934-2940)."""
    import numpy as np
    y = np.asarray(labels)
    n_pos = max(int((y == 1).sum()), 1)
    n_neg = max(int((y == 0).sum()), 1)
    return n_neg / n_pos


class VideoTrainState(NamedTuple):
    head: dict
    opt_state: tuple
    step: jnp.ndarray


def make_video_train_step(cfg: SigLIPConfig, optimizer,
                          policy=DEFAULT_POLICY, pos_weight: float = 1.0):
    """Frozen-backbone head training. batch = {"frames": (B,T,S,S,3) in
    normalized range, "labels": (B,)}."""

    def loss_fn(head, backbone, batch, rng):
        z = video_forward(backbone, head, batch["frames"], cfg, policy,
                          rng=rng)
        loss = bce_with_logits(z, batch["labels"], pos_weight)
        acc = jnp.mean(((z > 0) == (batch["labels"] > 0.5))
                       .astype(jnp.float32))
        return loss, acc

    def step(state: VideoTrainState, backbone, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.head, backbone, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.head)
        head = optax.apply_updates(state.head, updates)
        return (VideoTrainState(head, opt_state, state.step + 1),
                {"loss": loss, "acc": acc})

    def init_fn(head):
        return VideoTrainState(head, optimizer.init(head),
                               jnp.zeros((), jnp.int32))

    return init_fn, step


def make_video_eval_step(cfg: SigLIPConfig, policy=DEFAULT_POLICY):
    def step(head, backbone, frames):
        return video_forward(backbone, head, frames, cfg, policy)
    return step
