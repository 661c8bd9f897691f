"""Expert-stack preparation CLI: freq MLP → fusion head → CORAL, as one
command producing the reference's deployed artifact set.

Reference scripts S8/S9/S10 ("FreqMLP trainer.py", train_fusion_head_only.py,
the CORAL fitter, SURVEY.md §3.5): the reference prepares the v5 expert
stack with three separate scripts reading cached features. Here one command
runs the whole ladder on a REAL/FAKE folder corpus:

  1. 24-d FFT/SRM features for every image (batched device graph)
  2. frequency MLP training (deployed simple arch; --v5 trains the v5
     trainer arch as a SECOND artifact)
  3. SigLIP z_sig + freq z_freq corpus pass → Linear(2,1) fusion head on
     probabilities (the deployed appv3.py:1573-1590 head)
  4. fused-logit CORAL cutpoints + NLL temperature + bins histogram

Artifacts land in --save_dir under the reference's exact names/formats
(freq_mlp.safetensors keys net.0/1/3; fusion_head.safetensors fc.weight/
fc.bias; coral_cutpoints.json prob-space q25/q50/q75/max; coral_temp.json;
coral_bins.npy), so `cli/infer --artifacts <save_dir>` — or the reference
app itself — can consume them directly.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser():
    from tpudf.models.siglip import CONFIGS
    p = argparse.ArgumentParser(description="tpudf expert-stack trainer")
    p.add_argument("--data_dir", required=True,
                   help="folder dataset with REAL/FAKE class dirs "
                        "(train split used for fitting, val for the AUC "
                        "report when present; otherwise a random split)")
    p.add_argument("--save_dir", default="runs/experts")
    p.add_argument("--model_size", default="base-256",
                   choices=sorted(CONFIGS))
    p.add_argument("--backbone_ckpt", default=None)
    p.add_argument("--head_ckpt", default=None)
    p.add_argument("--v5", action="store_true",
                   help="also train + save the v5-trainer freq arch "
                        "(freq_mlp_v5.safetensors)")
    p.add_argument("--freq_epochs", type=int, default=60)
    p.add_argument("--fusion_steps", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p


def _gather(data_dir):
    from tpudf.data.datasets import IMG_EXTS
    paths, labels = [], []
    for cls, y in (("REAL", 0.0), ("FAKE", 1.0)):
        for root in (os.path.join(data_dir, "train", cls),
                     os.path.join(data_dir, cls)):
            if not os.path.isdir(root):
                continue
            for f in sorted(os.listdir(root)):
                if f.lower().endswith(IMG_EXTS):
                    paths.append(os.path.join(root, f))
                    labels.append(y)
    if not paths:
        raise SystemExit(f"no REAL/FAKE images under {data_dir}")
    return paths, np.asarray(labels, np.float32)


def _batches(paths, size, batch):
    """Yield (pixels_f01 (B,S,S,3), gray256 (B,256,256)) batches."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    for s in range(0, len(paths), batch):
        imgs = []
        for p in paths[s:s + batch]:
            im = Image.open(p).convert("RGB").resize((size, size))
            imgs.append(np.asarray(im, np.float32) / 255.0)
        px = np.stack(imgs)
        g = jnp.einsum("bhwc,c->bhw", jnp.asarray(px),
                       jnp.asarray([0.299, 0.587, 0.114]))
        if size != 256:
            g = jax.image.resize(g, (g.shape[0], 256, 256), "bilinear")
        yield px, np.asarray(g)


def _save_freq_simple(path, params):
    from safetensors.numpy import save_file
    save_file({
        "net.0.weight": np.asarray(params["ln"]["scale"], np.float32),
        "net.0.bias": np.asarray(params["ln"]["bias"], np.float32),
        "net.1.weight": np.asarray(params["fc1"]["w"], np.float32).T,
        "net.1.bias": np.asarray(params["fc1"]["b"], np.float32),
        "net.3.weight": np.asarray(params["fc2"]["w"], np.float32).T,
        "net.3.bias": np.asarray(params["fc2"]["b"], np.float32),
    }, path)


def _save_freq_v5(path, params):
    from safetensors.numpy import save_file
    sd = {
        "normer.mean": np.asarray(params["norm_mean"], np.float32),
        "normer.std": np.asarray(params["norm_std"], np.float32),
        "contrast.alpha": np.asarray(params["contrast"]["alpha"], np.float32),
        "contrast.beta": np.asarray(params["contrast"]["beta"], np.float32),
        "band.gates": np.asarray(params["gates"], np.float32),
        "head.weight": np.asarray(params["head"]["w"], np.float32).T,
        "head.bias": np.asarray(params["head"]["b"], np.float32),
        "temp.T": np.asarray(params["temp"], np.float32).reshape(1),
    }
    for i, blk in enumerate(params["blocks"]):
        sd[f"blocks.{i}.norm.weight"] = np.asarray(blk["ln"]["scale"],
                                                   np.float32)
        sd[f"blocks.{i}.norm.bias"] = np.asarray(blk["ln"]["bias"],
                                                 np.float32)
        sd[f"blocks.{i}.fc1.weight"] = np.asarray(blk["fc1"]["w"],
                                                  np.float32).T
        sd[f"blocks.{i}.fc1.bias"] = np.asarray(blk["fc1"]["b"], np.float32)
        sd[f"blocks.{i}.fc2.weight"] = np.asarray(blk["fc2"]["w"],
                                                  np.float32).T
        sd[f"blocks.{i}.fc2.bias"] = np.asarray(blk["fc2"]["b"], np.float32)
    from safetensors.numpy import save_file as _sf
    _sf(sd, path)


def _train_linear_fusion(p_sig, p_freq, labels, steps, seed):
    """Logistic Linear(2,1) on probabilities — the DEPLOYED fusion head
    format (appv3.py:1573-1590), unlike the adaptive head S8 trains."""
    import jax
    import jax.numpy as jnp
    import optax
    from tpudf.models.fusion import apply_fusion_linear

    params = {"w": jnp.asarray([[1.5], [1.5]], jnp.float32),
              "b": jnp.zeros((1,), jnp.float32)}
    opt = optax.adam(5e-2)
    st = opt.init(params)
    ps = jnp.asarray(p_sig, jnp.float32)
    pf = jnp.asarray(p_freq, jnp.float32)
    y = jnp.asarray(labels, jnp.float32)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            z = apply_fusion_linear(p, ps, pf)
            return optax.sigmoid_binary_cross_entropy(z, y).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = opt.update(g, st)
        return optax.apply_updates(params, up), st2, loss

    for _ in range(steps):
        params, st, loss = step(params, st)
    return params, float(loss)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from tpudf.eval.metrics import roc_auc
    from tpudf.models.freq_mlp import apply_freq_mlp, apply_freq_mlp_v5
    from tpudf.models.fusion import apply_fusion_linear
    from tpudf.models.heads import apply_binary_head, init_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.data.pipeline import normalize_siglip
    from tpudf.ops.fft_features import extract_freq_vector
    from tpudf.train.experts import fit_coral, train_freq_mlp

    args = build_argparser().parse_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)
    cfg = CONFIGS[args.model_size]

    paths, labels = _gather(args.data_dir)
    print(f"[experts] {len(paths)} images "
          f"({int(labels.sum())} fake / {int((1 - labels).sum())} real)")

    # backbone + visual head (same resolution logic as cli/infer)
    if args.backbone_ckpt:
        from safetensors.numpy import load_file
        from tpudf.models.convert import from_hf_state_dict
        backbone = from_hf_state_dict(load_file(args.backbone_ckpt), cfg)
    else:
        print("[warn] random backbone (smoke mode)")
        backbone = init_siglip(jax.random.key(args.seed), cfg)
    head = init_binary_head(jax.random.key(args.seed + 1), cfg.width)
    if args.head_ckpt:
        from tpudf.train.checkpoint import restore_checkpoint
        from tpudf.train.steps import init_train_state, make_optimizer
        opt = make_optimizer(total_steps=1)
        for ema in (None, 0.999):
            try:
                t = init_train_state(head, opt, ema)._asdict() | {"epoch": 0}
                r = restore_checkpoint(args.head_ckpt, t)
                head = r["ema"] if r.get("ema") is not None else r["params"]
                break
            except Exception:
                continue

    zsig_fn = jax.jit(lambda px: apply_binary_head(
        head, siglip_forward(backbone, normalize_siglip(px), cfg,
                             DEFAULT_POLICY)["pooled"]))
    feat_fn = jax.jit(extract_freq_vector)

    feats, z_sig = [], []
    for px, gray in _batches(paths, cfg.image_size, args.batch_size):
        feats.append(np.asarray(feat_fn(jnp.asarray(gray))))
        z_sig.append(np.asarray(zsig_fn(jnp.asarray(px))))
    feats = np.concatenate(feats)
    z_sig = np.concatenate(z_sig)

    # ---- S9: frequency MLP (deployed simple arch for the artifact)
    freq_params, freq_auc = train_freq_mlp(
        feats, labels, v5=False, epochs=args.freq_epochs, seed=args.seed)
    _save_freq_simple(os.path.join(args.save_dir, "freq_mlp.safetensors"),
                      freq_params)
    summary = {"freq_auc": float(freq_auc)}
    if args.v5:
        v5_params, v5_auc = train_freq_mlp(
            feats, labels, v5=True, epochs=args.freq_epochs, seed=args.seed)
        _save_freq_v5(os.path.join(args.save_dir,
                                   "freq_mlp_v5.safetensors"), v5_params)
        summary["freq_v5_auc"] = float(v5_auc)

    # ---- S8: deployed Linear(2,1) fusion on probabilities
    z_freq = np.asarray(apply_freq_mlp(freq_params, jnp.asarray(feats)))
    p_sig = 1.0 / (1.0 + np.exp(-z_sig))
    p_freq = 1.0 / (1.0 + np.exp(-z_freq / 1.25))      # FREQ_TEMP (engine)
    fusion_params, fusion_loss = _train_linear_fusion(
        p_sig, p_freq, labels, args.fusion_steps, args.seed)
    from safetensors.numpy import save_file
    save_file({"fc.weight": np.asarray(fusion_params["w"], np.float32).T,
               "fc.bias": np.asarray(fusion_params["b"], np.float32)},
              os.path.join(args.save_dir, "fusion_head.safetensors"))
    summary["fusion_loss"] = fusion_loss

    # ---- S10: CORAL cutpoints + temperature + bins
    z_fused = np.asarray(apply_fusion_linear(
        fusion_params, jnp.asarray(p_sig), jnp.asarray(p_freq)))
    fit = fit_coral(z_fused, labels)
    q = 1.0 / (1.0 + np.exp(-np.asarray(fit.cutpoints)))
    with open(os.path.join(args.save_dir, "coral_cutpoints.json"), "w") as f:
        json.dump({"q25": float(q[0]), "q50": float(q[1]),
                   "q75": float(q[2]), "max": float(q[3])}, f, indent=2)
    with open(os.path.join(args.save_dir, "coral_temp.json"), "w") as f:
        json.dump({"temperature": float(fit.temperature)}, f, indent=2)
    np.save(os.path.join(args.save_dir, "coral_bins.npy"),
            fit.bins_histogram)
    summary["fused_auc"] = float(roc_auc(labels, z_fused))
    summary["coral_cutpoints_prob"] = [float(v) for v in q]
    summary["coral_temperature"] = float(fit.temperature)

    with open(os.path.join(args.save_dir, "experts_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[experts]", json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
