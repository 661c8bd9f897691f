"""SID_Set multi-task trainer CLI (siglip2siddataset.py:1679-1764
equivalent): 3-class classification + tamper-mask segmentation with
frozen-backbone option, dynamic loss weights, dice/IoU/pixel-AUC eval, mask
threshold sweep.

Usage:
  python -m tpudf.cli.train_mtl --epochs 8 --subset_train 0.05
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tpudf MTL trainer")
    p.add_argument("--save_dir", default="runs/mtl")
    p.add_argument("--model_size", default="base-256")
    p.add_argument("--backbone_ckpt", default=None)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--seg_layers", type=int, nargs="+", default=[2, 6, 10, -1])
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--freeze_below", type=int, default=21)
    p.add_argument("--no_freeze", action="store_true")
    p.add_argument("--int8_frozen", action="store_true",
                   help="run the frozen backbone prefix on the fused W8A8 "
                        "int8 kernels inside the train step (calibrated on "
                        "the first training batch; 2x MXU rate on the "
                        "frozen layers)")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--seg_loss", default="combined",
                   choices=["combined", "bce_dice"])
    p.add_argument("--subset_train", type=float, default=1.0)
    p.add_argument("--mask_thr", type=float, default=0.5)
    p.add_argument("--sweep_mask_thr", action="store_true", default=True)
    p.add_argument("--no_sweep_mask_thr", dest="sweep_mask_thr",
                   action="store_false")
    p.add_argument("--patience", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir", default=None,
                   help="optional local folder dataset instead of HF SID_Set")
    return p.parse_args(argv)


def _load_local_sid(root, split, image_size):
    """Local SID-style layout: {root}/{split}/images/*.png,
    {root}/{split}/masks/<same name>.png (optional),
    {root}/{split}/labels.csv with `name,label` (0 real / 1 synthetic /
    2 tampered)."""
    import csv
    import os

    import numpy as np
    from PIL import Image

    base = os.path.join(root, split)
    labels = {}
    with open(os.path.join(base, "labels.csv")) as f:
        for row in csv.DictReader(f):
            labels[row["name"]] = int(row["label"])
    out = []
    img_dir = os.path.join(base, "images")
    mask_dir = os.path.join(base, "masks")
    for name in sorted(labels):
        img = Image.open(os.path.join(img_dir, name)).convert("RGB") \
            .resize((image_size, image_size), Image.BICUBIC)
        label = labels[name]
        mpath = os.path.join(mask_dir, name)
        if os.path.exists(mpath):
            m = Image.open(mpath).convert("L").resize(
                (image_size, image_size), Image.NEAREST)
            mask = (np.asarray(m, np.float32) > 127).astype(np.float32)
            has_mask = label == 2
        else:
            mask = np.zeros((image_size, image_size), np.float32)
            has_mask = False
        out.append({"pixels": np.asarray(img, np.uint8), "cls": label,
                    "binary": float(label > 0), "mask": mask,
                    "has_mask": has_mask})
    return out


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax

    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.data.datasets import load_sid_set, sid_example_to_arrays
    from tpudf.data.pipeline import normalize_siglip
    from tpudf.eval.metrics import (PixelAUCBuffer, dice_iou,
                                    multiclass_metrics, sweep_mask_threshold)
    from tpudf.models.segformer import MTLConfig, init_mtl
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.train.checkpoint import save_checkpoint
    from tpudf.train.loops import LoopConfig, run_training
    from tpudf.train.mtl import (dynamic_loss_weights, make_mtl_eval_step,
                                 make_mtl_train_step)
    from tpudf.train.steps import make_optimizer

    bb_cfg = CONFIGS[args.model_size]
    cfg = MTLConfig(backbone=bb_cfg, seg_layers=tuple(args.seg_layers),
                    embed_dim=args.embed_dim)
    key = jax.random.key(args.seed)
    backbone = None
    if args.backbone_ckpt:
        from safetensors.numpy import load_file
        from tpudf.models.convert import from_hf_state_dict
        backbone = from_hf_state_dict(load_file(args.backbone_ckpt), bb_cfg)
    params = init_mtl(key, cfg, backbone)

    # dataset: local folder (images/ masks/ labels.csv) or HF SID_Set
    if args.data_dir:
        train_data = _load_local_sid(args.data_dir, "train", args.image_size)
        val_data = _load_local_sid(args.data_dir, "val", args.image_size)
        if args.subset_train < 1.0:
            k = max(int(len(train_data) * args.subset_train),
                    args.batch_size)
            train_data = train_data[:k]
    else:
        try:
            train_raw = load_sid_set("train")
            val_raw = load_sid_set("validation")
        except Exception as e:
            raise SystemExit(f"SID_Set unavailable ({e}); provide --data_dir")

        def materialize(raw, frac):
            n = len(raw)
            take = max(int(n * frac), args.batch_size)
            return [sid_example_to_arrays(raw[i], args.image_size)
                    for i in range(min(take, n))]

        train_data = materialize(train_raw, args.subset_train)
        val_data = materialize(val_raw, min(args.subset_train * 2, 1.0))

    optimizer = make_optimizer(args.lr, total_steps=max(
        len(train_data) // args.batch_size, 1) * args.epochs)
    frozen_q = None
    if args.int8_frozen and not args.no_freeze:
        from tpudf.train.mtl import quantize_frozen_prefix
        calib = normalize_siglip(jnp.asarray(np.stack(
            [train_data[i]["pixels"] for i in
             range(min(16, len(train_data)))])).astype(jnp.float32) / 255.0)
        frozen_q = quantize_frozen_prefix(params, cfg, calib,
                                          DEFAULT_POLICY,
                                          args.freeze_below)
    init_fn, step = make_mtl_train_step(
        cfg, optimizer, DEFAULT_POLICY,
        freeze_below=None if args.no_freeze else args.freeze_below,
        seg_loss=args.seg_loss, accum_steps=args.accum_steps,
        frozen_q=frozen_q)
    eval_step = jax.jit(make_mtl_eval_step(cfg, DEFAULT_POLICY))
    step = jax.jit(step)
    state_box = {"state": init_fn(params), "mask_thr": args.mask_thr}

    def batches(data, shuffle, seed):
        idx = np.arange(len(data))
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        bs = args.batch_size
        for s in range(0, len(idx) - bs + 1, bs):
            chunk = [data[i] for i in idx[s:s + bs]]
            yield {
                "pixels": normalize_siglip(jnp.asarray(
                    np.stack([c["pixels"] for c in chunk]))
                    .astype(jnp.float32) / 255.0),
                "cls": jnp.asarray([c["cls"] for c in chunk]),
                "mask": jnp.asarray(np.stack([c["mask"] for c in chunk])),
                "has_mask": jnp.asarray([float(c["has_mask"])
                                         for c in chunk]),
            }

    from tpudf.data.prefetch import prefetch

    def train_epoch(epoch):
        cls_w, seg_w = dynamic_loss_weights(epoch, args.epochs)
        losses = []
        for i, b in enumerate(prefetch(
                batches(train_data, True, args.seed + epoch))):
            state_box["state"], m = step(state_box["state"], b,
                                         jax.random.key(epoch * 7919 + i),
                                         cls_w, seg_w)
            losses.append(float(m["loss"]))
        return {"loss": np.mean(losses) if losses else np.nan}

    def eval_epoch(epoch):
        all_cls, all_true = [], []
        dices, ious = [], []
        pix = PixelAUCBuffer()
        probs_cat, masks_cat = [], []
        for b in prefetch(batches(val_data, False, 0)):
            cls_logits, seg_probs = eval_step(state_box["state"].params,
                                              b["pixels"])
            all_cls.append(np.asarray(cls_logits))
            all_true.append(np.asarray(b["cls"]))
            hm = np.asarray(b["has_mask"]) > 0
            if hm.any():
                sp = np.asarray(seg_probs)[hm]
                tm = np.asarray(b["mask"])[hm]
                dd, ii = dice_iou((sp > state_box["mask_thr"])
                                  .astype(np.float32), tm)
                dices += list(dd)
                ious += list(ii)
                pix.add(sp, tm)
                probs_cat.append(sp)
                masks_cat.append(tm)
        m = multiclass_metrics(np.concatenate(all_true),
                               np.concatenate(all_cls))
        out = {"f1": m["macro_f1"], "acc": m["accuracy"],
               "dice": float(np.mean(dices)) if dices else 0.0,
               "iou": float(np.mean(ious)) if ious else 0.0,
               "pixel_auc": pix.auc()}
        if args.sweep_mask_thr and probs_cat:
            best = sweep_mask_threshold(np.concatenate(probs_cat),
                                        np.concatenate(masks_cat))
            state_box["mask_thr"] = best["threshold"]
            out["mask_thr"] = best["threshold"]
        return out

    def save_best(epoch, row):
        save_checkpoint(os.path.join(args.save_dir, "best"),
                        state_box["state"]._asdict() | {"epoch": epoch}, row)

    run_training(LoopConfig(epochs=args.epochs, patience=args.patience,
                            monitor="f1", save_dir=args.save_dir),
                 train_epoch, eval_epoch, save_best)


if __name__ == "__main__":
    main()
