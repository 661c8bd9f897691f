"""Jittable train/eval steps for the frozen-backbone classifier recipes.

These are the building blocks SURVEY.md §2.2 L2 describes (epoch loops with
AMP, grad accumulation, EMA, mixup, clipping) re-expressed as pure JAX step
functions; the Python epoch loop lives in train/loops.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpudf.core.precision import DEFAULT_POLICY, Policy
from tpudf.models.heads import apply_binary_head, apply_fast_binary_head
from tpudf.models.siglip import SigLIPConfig, siglip_forward
from tpudf.train.losses import bce_with_logits, mixup


class TrainState(NamedTuple):
    params: Any          # trainable params (head, and optionally backbone)
    opt_state: Any
    ema: Any             # EMA of trainable params (or None)
    step: jnp.ndarray


def make_optimizer(lr=1e-4, weight_decay=1e-4, warmup_steps=100,
                   total_steps=10_000, grad_clip=1.0,
                   schedule="warmup_cosine", kind="adamw"):
    """AdamW + warmup-cosine (hidf_video_classifier.py:2941-2948 analogue).

    kind="adafactor" gives the memory-lean optimizer state — the TPU-native
    answer to the reference's bitsandbytes AdamW8bit
    (siglip2siddataset.py:1219-1225): factored second moments instead of
    quantized full-size state."""
    if schedule == "warmup_cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    else:
        sched = lr
    if kind == "adafactor":
        inner = optax.adafactor(sched, weight_decay_rate=weight_decay)
    else:
        inner = optax.adamw(sched, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(grad_clip), inner)


def init_train_state(params, optimizer, ema_decay=None):
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        ema=jax.tree.map(jnp.copy, params) if ema_decay else None,
        step=jnp.zeros((), jnp.int32),
    )


def binary_forward(backbone_params, head_params, pixels, cfg: SigLIPConfig,
                   policy: Policy = DEFAULT_POLICY, head_kind="v5", rng=None):
    """Frozen-backbone binary logits: (B,H,W,3) → (B,)."""
    feats = siglip_forward(backbone_params, pixels, cfg, policy)["pooled"]
    feats = jax.lax.stop_gradient(feats)
    if head_kind == "v5":
        return apply_binary_head(head_params, feats, rng=rng)
    return apply_fast_binary_head(head_params, feats, rng=rng)


def make_binary_train_step(cfg: SigLIPConfig, optimizer,
                           policy: Policy = DEFAULT_POLICY, head_kind="v5",
                           ema_decay: float | None = None,
                           mixup_alpha: float = 0.0,
                           train_backbone: bool = False,
                           tome_r: int = 0, tome_floor: int = 0):
    """Returns step(state, backbone_params, batch, rng) -> (state, metrics).

    batch = {"pixels": (B,H,W,3), "labels": (B,) float 0/1}.
    When train_backbone=True, `state.params` must be
    {"backbone": ..., "head": ...} and gradients flow into the ViT.

    tome_r/tome_floor (frozen backbone only): extract features with ToMe
    token merging — the head then trains on EXACTLY the deployed serving
    features (ops/tome.py), removing the train/serve feature mismatch of
    deploying a speed mode the head never saw."""
    if tome_r and train_backbone:
        raise ValueError("tome_r is a frozen-backbone feature-extraction "
                         "mode (inference-only tower path)")

    def loss_fn(trainable, backbone_params, pixels, labels, rng):
        if train_backbone:
            bb, head = trainable["backbone"], trainable["head"]
        else:
            bb, head = backbone_params, trainable
        feats = siglip_forward(bb, pixels, cfg, policy, tome_r=tome_r,
                               tome_floor=tome_floor)["pooled"]
        if not train_backbone:
            feats = jax.lax.stop_gradient(feats)
        if head_kind == "v5":
            z = apply_binary_head(head, feats, rng=rng)
        else:
            z = apply_fast_binary_head(head, feats, rng=rng)
        loss = bce_with_logits(z, labels)
        acc = jnp.mean(((z > 0) == (labels > 0.5)).astype(jnp.float32))
        return loss, acc

    def step(state: TrainState, backbone_params, batch, rng):
        pixels, labels = batch["pixels"], batch["labels"]
        r_mix, r_drop = jax.random.split(rng)
        if mixup_alpha > 0:
            pixels, labels, _ = mixup(r_mix, pixels, labels, mixup_alpha)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, backbone_params, pixels, labels, r_drop)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            d = ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, params)
        new_state = TrainState(params, opt_state, ema, state.step + 1)
        return new_state, {"loss": loss, "acc": acc,
                           "grad_norm": optax.global_norm(grads)}

    return step


def make_binary_eval_step(cfg: SigLIPConfig, policy: Policy = DEFAULT_POLICY,
                          head_kind="v5"):
    def step(head_params, backbone_params, pixels):
        return binary_forward(backbone_params, head_params, pixels, cfg,
                              policy, head_kind)
    return step
