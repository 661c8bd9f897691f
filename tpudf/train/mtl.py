"""SID_Set multi-task training: 3-class classification + tamper segmentation.

Re-designs siglip2siddataset.py:1094-1764 (train_one) as jittable steps:
CE(3-class) + combined/bce_dice seg loss on the has-mask subset, dynamic
epoch-based loss weights, gradient accumulation, frozen-variant masking
(Siglip2sidafrozen.py:754-770: embeddings + layers < K frozen).

The has-mask subset is handled with a mask-weighted mean (static shapes)
instead of boolean indexing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpudf.models.segformer import MTLConfig, mtl_forward
from tpudf.train.losses import (bce_dice_loss, combined_segmentation_loss,
                                softmax_ce)


def dynamic_loss_weights(epoch: int, total_epochs: int, iou_focus=True):
    """Epoch-scheduled (cls_w, seg_w) mirroring siglip2siddataset.py:972-981
    + the IoU-focused reweighting (:1325-1334): seg weight ramps up as
    training progresses."""
    frac = epoch / max(total_epochs - 1, 1)
    cls_w = 1.0
    seg_w = 0.5 + 1.5 * frac if iou_focus else 1.0
    return cls_w, seg_w


def _masked_seg_loss(seg_logits, masks, has_mask, kind="combined"):
    """Mean seg loss over samples that have a mask. seg_logits/masks:
    (B, S, S); has_mask: (B,) float 0/1."""
    fn = combined_segmentation_loss if kind == "combined" else bce_dice_loss
    per = jax.vmap(lambda l, m: fn(l[None], m[None]))(seg_logits, masks)
    denom = jnp.maximum(jnp.sum(has_mask), 1.0)
    return jnp.sum(per * has_mask) / denom


def mtl_loss_fn(params, batch, cfg: MTLConfig, policy, cls_w, seg_w,
                seg_loss="combined", label_smoothing=0.0, rng=None,
                stop_grad_below=0, frozen_blocks_q=None):
    cls_logits, seg_logits = mtl_forward(params, batch["pixels"], cfg, policy,
                                         cls_dropout_rng=rng,
                                         stop_grad_below=stop_grad_below,
                                         frozen_blocks_q=frozen_blocks_q)
    l_cls = softmax_ce(cls_logits, batch["cls"], 3, label_smoothing)
    l_seg = _masked_seg_loss(seg_logits, batch["mask"], batch["has_mask"],
                             seg_loss)
    loss = cls_w * l_cls + seg_w * l_seg
    acc = jnp.mean((jnp.argmax(cls_logits, -1) == batch["cls"])
                   .astype(jnp.float32))
    return loss, {"loss": loss, "cls_loss": l_cls, "seg_loss": l_seg,
                  "cls_acc": acc}


def make_freeze_mask(params, cfg: MTLConfig, freeze_below: int = 21):
    """optax-compatible bool mask pytree: False = frozen. Freezes patch/pos
    embeddings and encoder layers < freeze_below (Siglip2sidafrozen.py
    :754-770); decoder, cls head, post-LN, MAP head stay trainable.

    Block leaves are stacked (L, ...); we freeze per-layer by zeroing those
    gradient slices inside `apply_freeze`, so the mask for blocks is True.
    """
    mask = jax.tree.map(lambda _: True, params)
    mask["backbone"]["embed"] = jax.tree.map(
        lambda _: False, mask["backbone"]["embed"])
    layer_trainable = (jnp.arange(cfg.backbone.layers) >= freeze_below
                      ).astype(jnp.float32)
    return mask, layer_trainable


def apply_freeze(grads, mask, layer_trainable):
    """Zero out frozen-subtree grads and frozen-layer slices of the stacked
    block grads."""
    grads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                         grads, mask)

    def scale_block(g):
        bc = layer_trainable.reshape((-1,) + (1,) * (g.ndim - 1))
        return g * bc

    grads["backbone"]["blocks"] = jax.tree.map(
        scale_block, grads["backbone"]["blocks"])
    return grads


class MTLTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def quantize_frozen_prefix(params, cfg: MTLConfig, calib_pixels, policy,
                           freeze_below: int = 21):
    """Static-int8 (W8A8) copy of the FROZEN backbone prefix for training:
    calibrate activation scales on a representative batch, quantize, and
    slice the stacked blocks to the first freeze_below layers. Pass the
    result as make_mtl_train_step(frozen_q=...) — the frozen layers then
    run the fused int8 inference kernels at the 2x MXU rate inside the
    train step (the trainable suffix and decoder stay bf16). TPU-native
    analogue of the reference's 8-bit frozen-backbone economy
    (bitsandbytes AdamW8bit, siglip2siddataset.py:1219-1225) applied to
    compute rather than optimizer state."""
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)
    k = max(0, min(int(freeze_below), cfg.backbone.layers))
    scales = calibrate_siglip_act_scales(params["backbone"], cfg.backbone,
                                         calib_pixels, policy)
    q = quantize_siglip_static(params["backbone"], scales, cfg.backbone)
    return jax.tree.map(lambda a: a[:k], q["blocks"])


def make_mtl_train_step(cfg: MTLConfig, optimizer, policy, *,
                        freeze_below: int | None = 21,
                        seg_loss="combined", accum_steps: int = 1,
                        frozen_q=None):
    """Returns (init_fn, step_fn). step(state, batch, rng, cls_w, seg_w).

    Gradient accumulation: batch leading dim = accum_steps * micro_batch;
    grads are averaged over micro-steps with lax.scan (static shapes, one
    optimizer update per call — same semantics as the reference accumulation,
    siglip2siddataset.py:1373-1380).

    frozen_q: optional quantize_frozen_prefix output — runs the frozen
    prefix on the W8A8 kernels (requires freeze_below)."""
    if frozen_q is not None and not freeze_below:
        raise ValueError("frozen_q requires freeze_below")

    def init_fn(params):
        return MTLTrainState(params, optimizer.init(params),
                             jnp.zeros((), jnp.int32))

    # stop-gradient at the freeze boundary: XLA drops the frozen prefix's
    # backward entirely (the apply_freeze zeroing below stays as the exact
    # no-drift guarantee for embeddings and optimizer statistics)
    sgb = freeze_below if freeze_below is not None else 0

    def one_grad(params, micro, rng, cls_w, seg_w):
        (loss, metrics), grads = jax.value_and_grad(
            mtl_loss_fn, has_aux=True)(params, micro, cfg, policy,
                                       cls_w, seg_w, seg_loss, rng=rng,
                                       stop_grad_below=sgb,
                                       frozen_blocks_q=frozen_q)
        return grads, metrics

    def step(state: MTLTrainState, batch, rng, cls_w, seg_w):
        params = state.params
        if freeze_below is not None:
            mask, layer_tr = make_freeze_mask(params, cfg, freeze_below)

        if accum_steps == 1:
            grads, metrics = one_grad(params, batch, rng, cls_w, seg_w)
        else:
            def split(x):
                return x.reshape((accum_steps, -1) + x.shape[1:])
            micro_batches = jax.tree.map(split, batch)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                micro, r = xs
                g, m = one_grad(params, micro, r, cls_w, seg_w)
                return jax.tree.map(jnp.add, carry, g), m
            zero = jax.tree.map(jnp.zeros_like, params)
            grads, metrics = jax.lax.scan(body, zero, (micro_batches, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)

        if freeze_below is not None:
            grads = apply_freeze(grads, mask, layer_tr)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if freeze_below is not None:
            # restore frozen values exactly — decoupled weight decay would
            # otherwise still drift zero-grad params
            new_params = jax.tree.map(
                lambda new, old, m: new if m else old, new_params, params, mask)
            def keep_frozen_layers(new, old):
                bc = layer_tr.reshape((-1,) + (1,) * (new.ndim - 1))
                return new * bc + old * (1 - bc)
            new_params["backbone"]["blocks"] = jax.tree.map(
                keep_frozen_layers, new_params["backbone"]["blocks"],
                params["backbone"]["blocks"])
        return MTLTrainState(new_params, opt_state, state.step + 1), metrics

    return init_fn, step


def make_mtl_eval_step(cfg: MTLConfig, policy):
    def step(params, pixels):
        cls_logits, seg_logits = mtl_forward(params, pixels, cfg, policy)
        return cls_logits, jax.nn.sigmoid(seg_logits)
    return step
