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
    p.add_argument("--int8_backbone", action="store_true",
                   help="run the frozen backbone on the fused W8A8 int8 "
                        "kernels during training (calibrated on the first "
                        "training clip's frames)")
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--analysis", action="store_true",
                   help="post-training publication analysis: activation "
                        "stats, learning-vs-memorization 16-panel dashboard "
                        "+ inference figure suite "
                        "(hidf_video_classifier.py:2034-3284)")
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
    if args.int8_backbone:
        from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                     quantize_siglip_static)
        first = next(iter(train_ds.batches(min(2, max(len(train_ds), 1)))))
        frames = jnp.asarray(first["frames"]).astype(jnp.float32) / 255.0
        calib = normalize_siglip(frames.reshape(-1, *frames.shape[2:])[:16])
        scales = calibrate_siglip_act_scales(backbone, cfg, calib,
                                             DEFAULT_POLICY)
        backbone = quantize_siglip_static(backbone, scales, cfg)
        print("[int8] frozen backbone statically quantized (W8A8)")
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

    from tpudf.data.prefetch import prefetch

    def train_epoch(epoch):
        losses = []
        for i, batch in enumerate(prefetch(train_ds.batches(
                args.batch_size, shuffle=True, seed=args.seed + epoch))):
            state_box["state"], m = step(
                state_box["state"], backbone, _prep(batch),
                jax.random.key(epoch * 9999 + i))
            losses.append(float(m["loss"]))
        return {"loss": np.mean(losses) if losses else np.nan}

    def eval_epoch(epoch):
        probs, labels = [], []
        for batch in prefetch(val_ds.batches(args.batch_size)):
            z = eval_step(state_box["state"].head, backbone,
                          _prep(batch)["frames"])
            probs.append(1 / (1 + np.exp(-np.asarray(z))))
            labels.append(batch["labels"])
        if not probs:
            return {"f1": 0.0}
        y = np.concatenate(labels)
        p = np.clip(np.concatenate(probs), 1e-7, 1 - 1e-7)
        # include val BCE: the learning-vs-memorization battery reads
        # history['val_loss'] (eval/analysis.py default val_key) and the
        # generalization-gap panels silently degenerate without it
        loss = float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))
        return {"loss": loss, **binary_metrics(y, p)}

    if args.evaluate_only:
        print("[evaluate_only]", eval_epoch(0))
        return

    def save_best(epoch, row):
        save_checkpoint(os.path.join(args.save_dir, "best"),
                        state_box["state"]._asdict() | {"epoch": epoch}, row)

    history = run_training(
        LoopConfig(epochs=args.epochs, patience=args.patience,
                   monitor="f1", save_dir=args.save_dir),
        train_epoch, eval_epoch, save_best)

    if args.analysis:
        _publication_analysis(args, cfg, backbone, state_box["state"].head,
                              train_ds, val_ds, eval_step, _prep, history)


def _publication_analysis(args, cfg, backbone, head, train_ds, val_ds,
                          eval_step, _prep, history):
    """Post-training suite (hidf_video_classifier.py:3124-3284): sampled
    train/val confidences, activation statistics on the head, the
    learning-vs-memorization metric battery + 16-panel dashboard, and the
    inference figure suite on the val split."""
    import json

    import jax

    from tpudf.data.pipeline import normalize_siglip
    from tpudf.eval.analysis import (activation_statistics,
                                     learning_memorization_metrics,
                                     plot_memorization_dashboard,
                                     video_head_activations)
    from tpudf.eval.plots import render_inference_report
    from tpudf.models.siglip import siglip_forward
    from tpudf.core.precision import DEFAULT_POLICY

    def _probs(ds, cap_batches=10):
        probs, labels = [], []
        for i, batch in enumerate(ds.batches(args.batch_size)):
            if i >= cap_batches:
                break
            z = eval_step(head, backbone, _prep(batch)["frames"])
            probs.append(1 / (1 + np.exp(-np.asarray(z, np.float64))))
            labels.append(np.asarray(batch["labels"], np.float64))
        if not probs:
            return np.zeros(0), np.zeros(0)
        return np.concatenate(probs), np.concatenate(labels)

    train_p, _ = _probs(train_ds)
    val_p, val_y = _probs(val_ds)

    act_stats = None
    for batch in val_ds.batches(args.batch_size):
        fr = _prep(batch)["frames"]
        b, t = fr.shape[:2]
        feats = siglip_forward(
            backbone, fr.reshape(b * t, *fr.shape[2:]), cfg,
            DEFAULT_POLICY)["pooled"].reshape(b, t, -1)
        act_stats = activation_statistics(
            video_head_activations(head, feats))
        break

    metrics = learning_memorization_metrics(
        history, train_probs=train_p if len(train_p) else None,
        val_probs=val_p if len(val_p) else None,
        activation_stats=act_stats)
    n_head = sum(int(np.prod(np.shape(l))) for l in
                 jax.tree.leaves(head)) if head else 0
    n_bb = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(backbone))
    path = plot_memorization_dashboard(
        metrics, history, args.save_dir, train_probs=train_p,
        val_probs=val_p, n_params={"backbone": n_bb, "head": n_head})
    with open(os.path.join(args.save_dir,
                           "learning_analysis.json"), "w") as f:
        json.dump({k: v for k, v in metrics.items()
                   if not isinstance(v, np.ndarray)}, f, indent=2,
                  default=float)
    if len(val_p):
        render_inference_report(val_y, val_p,
                                os.path.join(args.save_dir, "figures"))
    print(f"[analysis] {metrics.get('learning_type')} "
          f"(score {metrics.get('learning_score'):.1f}/10) → {path}")


if __name__ == "__main__":
    main()
