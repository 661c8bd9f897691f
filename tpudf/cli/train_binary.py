"""CiFake-style binary classifier trainer CLI.

tpudf equivalent of cifake_binary_classifier.py:1691-2295 `main`: frozen
SigLIP backbone + trainable head on a TRAIN/VAL/TEST REAL|FAKE folder
dataset, with EMA, mixup, warmup-cosine, early stopping, best-F1
checkpointing, CSV ledger and an --evaluate_only mode.

Usage:
  python -m tpudf.cli.train_binary --data_dir /path/to/cifake \
      --model_size tiny --epochs 10 --save_dir runs/cifake
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpudf binary trainer")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--save_dir", default="runs/binary")
    from tpudf.models.siglip import CONFIGS
    p.add_argument("--model_size", default="base-256",
                   choices=sorted(CONFIGS))
    p.add_argument("--head", default="v5", choices=["v5", "fast"])
    p.add_argument("--backbone_ckpt", default=None,
                   help="HF SiglipVisionModel dir/safetensors to convert")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--mixup_alpha", type=float, default=0.0)
    p.add_argument("--ema_decay", type=float, default=0.0)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--augment", action="store_true", default=True)
    p.add_argument("--no_augment", dest="augment", action="store_false")
    p.add_argument("--tome_r", type=int, default=None, const=-1, nargs="?",
                   help="extract features with ToMe token merging so the "
                        "head trains on the deployed serving features; "
                        "bare --tome_r uses the certified deployed "
                        "schedule (ops/tome.py)")
    p.add_argument("--int8_backbone", action="store_true",
                   help="run the frozen backbone on the fused W8A8 int8 "
                        "kernels during training (calibrated on the first "
                        "training batch; int8 feature AUC delta is "
                        "end-task-certified, tests/test_train_infer_e2e)")
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--resume", default=None)
    p.add_argument("--subset", type=float, default=1.0,
                   help="fraction of train data (smoke runs)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.data.augment import train_augment
    from tpudf.data.datasets import FolderImageDataset
    from tpudf.data.pipeline import normalize_siglip
    from tpudf.eval.metrics import binary_metrics
    from tpudf.models.heads import init_binary_head, init_fast_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
    from tpudf.train.checkpoint import (restore_train_state, save_checkpoint)
    from tpudf.train.loops import LoopConfig, run_training
    from tpudf.train.steps import (init_train_state, make_binary_train_step,
                                   make_optimizer)

    cfg = CONFIGS[args.model_size]
    size = cfg.image_size
    key = jax.random.key(args.seed)

    if args.backbone_ckpt:
        from tpudf.models.convert import from_hf_state_dict
        from safetensors.numpy import load_file
        backbone = from_hf_state_dict(load_file(args.backbone_ckpt), cfg)
    else:
        print("[warn] no --backbone_ckpt: random backbone (smoke mode)")
        backbone = init_siglip(key, cfg)

    if args.head == "v5":
        head = init_binary_head(jax.random.key(args.seed + 1), cfg.width)
    else:
        head = init_fast_binary_head(jax.random.key(args.seed + 1),
                                     cfg.width, "small")

    train_ds = FolderImageDataset(args.data_dir, "train", size)
    val_ds = FolderImageDataset(args.data_dir, "val", size)
    if args.subset < 1.0:
        train_ds.samples = train_ds.samples[
            :max(int(len(train_ds.samples) * args.subset), args.batch_size)]

    if args.int8_backbone:
        from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                     quantize_siglip_static)
        first = next(iter(train_ds.batches(min(16, len(train_ds)))))
        calib = normalize_siglip(
            jnp.asarray(first["pixels"]).astype(jnp.float32) / 255.0)
        scales = calibrate_siglip_act_scales(backbone, cfg, calib,
                                             DEFAULT_POLICY)
        backbone = quantize_siglip_static(backbone, scales, cfg)
        print("[int8] frozen backbone statically quantized (W8A8) — "
              "training features and eval both use the int8 tower")

    tome_r, tome_floor = 0, 0
    if args.tome_r is not None:
        from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
        s_tokens = (cfg.image_size // cfg.patch_size) ** 2
        tome_r = DEPLOYED_TOME_R if args.tome_r < 0 else args.tome_r
        tome_floor = deployed_floor(s_tokens) if args.tome_r < 0 else 0

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    optimizer = make_optimizer(args.lr, args.weight_decay, args.warmup_steps,
                               steps_per_epoch * args.epochs)
    state = init_train_state(head, optimizer,
                             args.ema_decay if args.ema_decay else None)
    if args.resume and os.path.exists(args.resume):
        from tpudf.train.steps import TrainState
        restored = restore_train_state(args.resume, head, optimizer)
        # reconcile the checkpoint's EMA shape with the CLI flag BEFORE the
        # train step is built (its ema_decay is baked into the jit): a
        # restored-EMA checkpoint without --ema_decay would otherwise crash
        # at trace time, and --ema_decay on a no-EMA checkpoint would
        # silently drop tracking (ADVICE r4)
        has_ema = restored.get("ema") is not None
        if has_ema and not args.ema_decay:
            args.ema_decay = 0.999
            print("[resume][warn] checkpoint tracks EMA but --ema_decay "
                  "was not given — continuing EMA with decay 0.999")
        elif not has_ema and args.ema_decay:
            restored["ema"] = jax.tree.map(lambda x: x, restored["params"])
            print("[resume][warn] --ema_decay given but checkpoint has no "
                  "EMA slot — seeding EMA from the restored params")
        state = TrainState(params=restored["params"],
                           opt_state=restored["opt_state"],
                           ema=restored.get("ema"),
                           step=restored["step"])
        print(f"[resume] restored {args.resume} "
              f"(epoch {restored.get('epoch')})")
    step = jax.jit(make_binary_train_step(
        cfg, optimizer, DEFAULT_POLICY, args.head,
        ema_decay=args.ema_decay or None, mixup_alpha=args.mixup_alpha,
        tome_r=tome_r, tome_floor=tome_floor))

    from tpudf.models.heads import apply_binary_head, apply_fast_binary_head
    apply = apply_binary_head if args.head == "v5" else apply_fast_binary_head
    infer = jax.jit(lambda head, px: apply(
        head, siglip_forward(backbone, px, cfg, DEFAULT_POLICY,
                             tome_r=tome_r,
                             tome_floor=tome_floor)["pooled"]))

    aug = jax.jit(lambda rng, x: train_augment(rng, x))
    state_box = {"state": state}

    from tpudf.data.prefetch import prefetch

    def train_epoch(epoch):
        losses, accs = [], []
        for i, batch in enumerate(prefetch(train_ds.batches(
                args.batch_size, shuffle=True, seed=args.seed + epoch,
                drop_last=True))):
            x = jnp.asarray(batch["pixels"]).astype(jnp.float32) / 255.0
            rng = jax.random.key(epoch * 100000 + i)
            if args.augment:
                r_aug, rng = jax.random.split(rng)
                x = aug(r_aug, x)
            b = {"pixels": normalize_siglip(x),
                 "labels": jnp.asarray(batch["labels"])}
            state_box["state"], m = step(state_box["state"], backbone, b, rng)
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        return {"loss": np.mean(losses), "acc": np.mean(accs)}

    def eval_epoch(epoch):
        probs, labels = [], []
        params = state_box["state"].ema or state_box["state"].params
        for batch in prefetch(val_ds.batches(args.batch_size)):
            x = normalize_siglip(jnp.asarray(batch["pixels"])
                                 .astype(jnp.float32) / 255.0)
            z = infer(params, x)
            probs.append(1 / (1 + np.exp(-np.asarray(z))))
            labels.append(batch["labels"])
        return binary_metrics(np.concatenate(labels), np.concatenate(probs))

    if args.evaluate_only:
        print("[evaluate_only]", eval_epoch(0))
        return

    def save_best(epoch, row):
        save_checkpoint(os.path.join(args.save_dir, "best"),
                        state_box["state"]._asdict() | {"epoch": epoch},
                        metrics=row)

    run_training(LoopConfig(epochs=args.epochs, patience=args.patience,
                            monitor="f1", save_dir=args.save_dir),
                 train_epoch, eval_epoch, save_best)


if __name__ == "__main__":
    main()
