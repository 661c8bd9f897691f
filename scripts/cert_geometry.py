"""Deployed-geometry end-task certification of the speed modes
(VERDICT r4 next #1/#5): measure int8 / ToMe AUC deltas at REAL base-256
tower geometry, not the test-64 toy.

Procedure (zero-egress stand-in for the CiFake quality gate,
docs/CERTIFICATION.md):
  1. procedural real-vs-fake data at 256px with token-level cues
     (tpudf/data/synth_detect.py), difficulty tuned so float AUC sits in
     a measurable band;
  2. random-init base-256 tower, FROZEN — extract pooled features per
     speed mode (float / ToMe schedules / W8A8 static int8 calibrated on
     train images / combos);
  3. train a binary MLP head on the FLOAT train features (the strictest,
     train-serve-mismatched deployment case), then score every mode's
     val features with that same head;
  4. additionally train a head ON the candidate schedule's features
     (matched train/serve — what `cli/train_binary --tome_r` produces)
     and score it, since deployment can include retraining.

The r=96/floor-32 deploy decision keys off these deltas: single mode
within 0.02 AUC of float, int8+ToMe combined within 0.03 (same gate the
e2e test pins at toy geometry).

Run on the real chip:  python scripts/cert_geometry.py
CI version (reduced):  tests/test_deployed_geometry.py
"""
import argparse
import functools
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from tpudf.core.precision import DEFAULT_POLICY
from tpudf.data.pipeline import normalize_siglip
from tpudf.data.synth_detect import make_detect_batch
from tpudf.eval.metrics import roc_auc
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)
from tpudf.ops.tome import deployed_floor, merge_schedule


def extract_features(backbone, imgs_uint8, cfg, tome_r=0, tome_floor=0,
                     chunk=256):
    """Pooled features for a uint8 image stack, chunked so every mode
    compiles exactly one forward shape."""
    n = imgs_uint8.shape[0]
    fwd = jax.jit(functools.partial(
        _fwd, cfg=cfg, tome_r=tome_r, tome_floor=tome_floor))
    outs = []
    for i in range(0, n, chunk):
        x = jnp.asarray(imgs_uint8[i:i + chunk], jnp.float32) / 255.0
        outs.append(np.asarray(fwd(backbone, x)))
    return np.concatenate(outs, 0)


def _fwd(backbone, x, *, cfg, tome_r, tome_floor):
    return siglip_forward(backbone, normalize_siglip(x), cfg,
                          DEFAULT_POLICY, tome_r=tome_r,
                          tome_floor=tome_floor)["pooled"]


def train_head(feats, labels, width, seed=0, steps=400, lr=1e-3):
    """Small BCE head trainer on frozen (N, W) features, full batch."""
    head = init_binary_head(jax.random.key(seed), width)
    opt = optax.adamw(lr, weight_decay=1e-4)
    state = opt.init(head)
    x = jnp.asarray(feats)
    y = jnp.asarray(labels)

    @jax.jit
    def step(head, state):
        def loss_fn(h):
            z = apply_binary_head(h, x)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(z, y))
        loss, g = jax.value_and_grad(loss_fn)(head)
        up, state2 = opt.update(g, state, head)
        return optax.apply_updates(head, up), state2, loss

    for _ in range(steps):
        head, state, loss = step(head, state)
    return head, float(loss)


def auc_of(head, feats, labels):
    z = np.asarray(apply_binary_head(head, jnp.asarray(feats)))
    return roc_auc(labels, z)


def certify(model_size="base-256", n_train=768, n_val=384, amp=0.03,
            seed=0, chunk=256, head_steps=400,
            extra_matched=("tome96",)):
    cfg = CONFIGS[model_size]
    s = cfg.image_size
    n_tok = (s // cfg.patch_size) ** 2
    floor = deployed_floor(n_tok)
    # scale the device chunk with geometry: a 256-image chunk at
    # large-384/so400m activations over-fills HBM (measured: crashes the
    # worker), and a smaller chunk costs only extra dispatches
    if s >= 512 or cfg.width > 1024:
        chunk = min(chunk, 32)
    elif s >= 384 or cfg.width > 768:
        chunk = min(chunk, 64)

    tr_imgs, tr_y = make_detect_batch(n_train // 2, s, seed=seed,
                                      artifact_amp=amp)
    va_imgs, va_y = make_detect_batch(n_val // 2, s, seed=seed + 1,
                                      artifact_amp=amp)

    backbone = init_siglip(jax.random.key(seed), cfg)
    # int8: calibrate activation scales on train images (the deployed
    # recipe — serve/engine.quantize)
    calib = jnp.asarray(tr_imgs[:: max(1, n_train // 64)],
                        jnp.float32) / 255.0
    scales = calibrate_siglip_act_scales(backbone, cfg,
                                         normalize_siglip(calib),
                                         DEFAULT_POLICY)
    backbone_q = quantize_siglip_static(backbone, scales, cfg)

    modes = {
        "float":         (backbone, 0, 0),
        "tome32":        (backbone, 32, 0),
        "tome64":        (backbone, 64, floor),
        "tome96":        (backbone, 96, floor),
        "tome128":       (backbone, 128, floor),
        "int8":          (backbone_q, 0, 0),
        "int8+tome64":   (backbone_q, 64, floor),
        "int8+tome96":   (backbone_q, 96, floor),
    }

    feats = {}
    for name, (bb, r, fl) in modes.items():
        feats[name] = {
            "train": extract_features(bb, tr_imgs, cfg, r, fl, chunk),
            "val": extract_features(bb, va_imgs, cfg, r, fl, chunk),
        }

    head, loss = train_head(feats["float"]["train"], tr_y, cfg.width,
                            seed=seed, steps=head_steps)
    results = {}
    auc_float = auc_of(head, feats["float"]["val"], va_y)
    for name in modes:
        a = auc_of(head, feats[name]["val"], va_y)
        results[name] = {"auc": a, "delta": a - auc_float}

    # matched train/serve rows: head trained on the mode's own features
    for name in extra_matched:
        h2, _ = train_head(feats[name]["train"], tr_y, cfg.width,
                           seed=seed, steps=head_steps)
        a = auc_of(h2, feats[name]["val"], va_y)
        results[f"{name}(matched)"] = {"auc": a, "delta": a - auc_float}

    results["_meta"] = {
        "geometry": model_size, "n_tokens": n_tok, "floor": floor,
        "n_train": n_train, "n_val": n_val, "amp": amp,
        "head_final_loss": loss,
        "schedules": {
            f"r{r}": merge_schedule(n_tok, cfg.layers, r, min_tokens=floor)
            for r in (64, 96, 128)},
    }
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_size", default="base-256")
    p.add_argument("--n_train", type=int, default=768)
    p.add_argument("--n_val", type=int, default=384)
    p.add_argument("--amp", type=float, default=0.03)
    p.add_argument("--seeds", type=int, default=2)
    args = p.parse_args(argv)

    agg = {}
    for seed in range(args.seeds):
        res = certify(args.model_size, args.n_train, args.n_val, args.amp,
                      seed=seed)
        meta = res.pop("_meta")
        if seed == 0:
            print(f"geometry={meta['geometry']} tokens={meta['n_tokens']} "
                  f"floor={meta['floor']} amp={meta['amp']} "
                  f"n={meta['n_train']}+{meta['n_val']}")
            for k, v in meta["schedules"].items():
                print(f"  schedule {k}: {v}")
        for name, r in res.items():
            agg.setdefault(name, []).append(r)
        print(f"-- seed {seed}")
        for name, r in res.items():
            print(f"  {name:16s} AUC {r['auc']:.4f}  "
                  f"delta {r['delta']:+.4f}")

    print("== mean over seeds ==")
    for name, rs in agg.items():
        aucs = [r["auc"] for r in rs]
        deltas = [r["delta"] for r in rs]
        print(f"  {name:16s} AUC {np.mean(aucs):.4f} "
              f"(min {np.min(aucs):.4f})  delta {np.mean(deltas):+.4f} "
              f"(worst {max(deltas, key=abs):+.4f})")


if __name__ == "__main__":
    main()
