"""HiDF-style video classifier trainer CLI
(hidf_video_classifier.py:2805-3121 equivalent).

Usage:
  python -m tpudf.cli.train_video --data_dir /path/to/hidf --epochs 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpudf video trainer")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--save_dir", default="runs/video")
    p.add_argument("--model_size", default="base-256")
    p.add_argument("--backbone_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.data.datasets import FolderVideoDataset
    from tpudf.data.pipeline import normalize_siglip
    from tpudf.eval.metrics import binary_metrics
    from tpudf.models.heads import init_video_head
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.train.checkpoint import save_checkpoint
    from tpudf.train.loops import LoopConfig, run_training
    from tpudf.train.steps import make_optimizer
    from tpudf.train.video import (auto_pos_weight, make_video_eval_step,
                                   make_video_train_step)

    cfg = CONFIGS[args.model_size]
    key = jax.random.key(args.seed)
    if args.backbone_ckpt:
        from safetensors.numpy import load_file
        from tpudf.models.convert import from_hf_state_dict
        backbone = from_hf_state_dict(load_file(args.backbone_ckpt), cfg)
    else:
        print("[warn] random backbone (smoke mode)")
        backbone = init_siglip(key, cfg)
    head = init_video_head(jax.random.key(args.seed + 1), cfg.width)

    train_ds = FolderVideoDataset(args.data_dir, "train", args.num_frames,
                                  cfg.image_size)
    val_ds = FolderVideoDataset(args.data_dir, "val", args.num_frames,
                                cfg.image_size)
    labels = [l for _, l in train_ds.samples]
    pos_w = auto_pos_weight(labels) if labels else 1.0
    optimizer = make_optimizer(args.lr, total_steps=max(
        len(train_ds) // args.batch_size, 1) * args.epochs)
    init_fn, step = make_video_train_step(cfg, optimizer, DEFAULT_POLICY,
                                          pos_w)
    eval_step = jax.jit(make_video_eval_step(cfg, DEFAULT_POLICY))
    step = jax.jit(step)
    state_box = {"state": init_fn(head)}

    def _prep(batch):
        x = jnp.asarray(batch["frames"]).astype(jnp.float32) / 255.0
        return {"frames": normalize_siglip(x),
                "labels": jnp.asarray(batch["labels"])}

    def train_epoch(epoch):
        losses = []
        for i, batch in enumerate(train_ds.batches(
                args.batch_size, shuffle=True, seed=args.seed + epoch)):
            state_box["state"], m = step(
                state_box["state"], backbone, _prep(batch),
                jax.random.key(epoch * 9999 + i))
            losses.append(float(m["loss"]))
        return {"loss": np.mean(losses) if losses else np.nan}

    def eval_epoch(epoch):
        probs, labels = [], []
        for batch in val_ds.batches(args.batch_size):
            z = eval_step(state_box["state"].head, backbone,
                          _prep(batch)["frames"])
            probs.append(1 / (1 + np.exp(-np.asarray(z))))
            labels.append(batch["labels"])
        if not probs:
            return {"f1": 0.0}
        return binary_metrics(np.concatenate(labels), np.concatenate(probs))

    if args.evaluate_only:
        print("[evaluate_only]", eval_epoch(0))
        return

    def save_best(epoch, row):
        save_checkpoint(os.path.join(args.save_dir, "best"),
                        state_box["state"]._asdict() | {"epoch": epoch}, row)

    run_training(LoopConfig(epochs=args.epochs, patience=args.patience,
                            monitor="f1", save_dir=args.save_dir),
                 train_epoch, eval_epoch, save_best)


if __name__ == "__main__":
    main()
