"""Checkpoint conversion: HF / open_clip SigLIP weights → tpudf pytree.

The reference loads backbones two ways (SURVEY.md §1): open_clip
`create_model_and_transforms(..., pretrained="webli")` (appv3.py:1223) and HF
`SiglipVisionModel.from_pretrained` (siglip2siddataset.py:753). This module
maps either state dict onto the tpudf layout (models/siglip.py docstring).

Works from a plain `{name: np.ndarray}` dict so torch is only needed by the
caller that produced the state dict.

CLI (`python -m tpudf.models.convert`): convert an HF model directory /
safetensors file / torch .pt|.bin / open_clip checkpoint into an orbax
checkpoint + config sidecar consumable by the CLIs and serving engine:

    python -m tpudf.models.convert --src google/siglip-base-patch16-256 \
        --out /ckpts/siglip_base_256 [--kind auto|hf|open_clip|mtl]
"""

from __future__ import annotations

import re
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from tpudf.models.siglip import SigLIPConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> dict:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(vision_model\.|visual\.|module\.)", "", k)
        # nested prefix e.g. "vision_model.vision_model."
        k = re.sub(r"^vision_model\.", "", k)
        out[k] = v
    return out


def config_from_hf(hf_cfg) -> SigLIPConfig:
    """Build a SigLIPConfig from a transformers SiglipVisionConfig."""
    return SigLIPConfig(
        width=hf_cfg.hidden_size,
        layers=hf_cfg.num_hidden_layers,
        heads=hf_cfg.num_attention_heads,
        mlp_dim=hf_cfg.intermediate_size,
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        ln_eps=hf_cfg.layer_norm_eps,
    )


def from_hf_state_dict(sd: Mapping, cfg: SigLIPConfig) -> dict:
    """Convert an HF SiglipVisionModel state dict (torch tensors or numpy)."""
    sd = {k: _np(v) for k, v in _strip_prefix(sd).items()}
    w, p = cfg.width, cfg.patch_size

    conv = sd["embeddings.patch_embedding.weight"]        # (W, 3, p, p)
    kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, w)
    params = {
        "embed": {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(sd["embeddings.patch_embedding.bias"]),
            "pos": jnp.asarray(sd["embeddings.position_embedding.weight"]),
        }
    }

    blocks = []
    for i in range(cfg.layers):
        pre = f"encoder.layers.{i}."
        qw = sd[pre + "self_attn.q_proj.weight"].T
        kw = sd[pre + "self_attn.k_proj.weight"].T
        vw = sd[pre + "self_attn.v_proj.weight"].T
        qb = sd[pre + "self_attn.q_proj.bias"]
        kb = sd[pre + "self_attn.k_proj.bias"]
        vb = sd[pre + "self_attn.v_proj.bias"]
        blocks.append({
            "ln1": {"scale": sd[pre + "layer_norm1.weight"],
                    "bias": sd[pre + "layer_norm1.bias"]},
            "attn": {
                "qkv_w": np.concatenate([qw, kw, vw], axis=1),
                "qkv_b": np.concatenate([qb, kb, vb]),
                "out_w": sd[pre + "self_attn.out_proj.weight"].T,
                "out_b": sd[pre + "self_attn.out_proj.bias"],
            },
            "ln2": {"scale": sd[pre + "layer_norm2.weight"],
                    "bias": sd[pre + "layer_norm2.bias"]},
            "mlp": {
                "fc1_w": sd[pre + "mlp.fc1.weight"].T,
                "fc1_b": sd[pre + "mlp.fc1.bias"],
                "fc2_w": sd[pre + "mlp.fc2.weight"].T,
                "fc2_b": sd[pre + "mlp.fc2.bias"],
            },
        })
    import jax
    params["blocks"] = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)

    params["post_ln"] = {"scale": jnp.asarray(sd["post_layernorm.weight"]),
                         "bias": jnp.asarray(sd["post_layernorm.bias"])}

    if "head.probe" in sd and cfg.with_head:
        params["head"] = {
            "probe": jnp.asarray(sd["head.probe"].reshape(1, w)),
            "in_w": jnp.asarray(sd["head.attention.in_proj_weight"].T),
            "in_b": jnp.asarray(sd["head.attention.in_proj_bias"]),
            "out_w": jnp.asarray(sd["head.attention.out_proj.weight"].T),
            "out_b": jnp.asarray(sd["head.attention.out_proj.bias"]),
            "ln": {"scale": jnp.asarray(sd["head.layernorm.weight"]),
                   "bias": jnp.asarray(sd["head.layernorm.bias"])},
            "fc1_w": jnp.asarray(sd["head.mlp.fc1.weight"].T),
            "fc1_b": jnp.asarray(sd["head.mlp.fc1.bias"]),
            "fc2_w": jnp.asarray(sd["head.mlp.fc2.weight"].T),
            "fc2_b": jnp.asarray(sd["head.mlp.fc2.bias"]),
        }
    return params


def from_reference_mtl_state_dict(sd: Mapping, mtl_cfg) -> dict:
    """Convert a reference SigLIP2_MTL torch checkpoint
    (siglip2siddataset.py:750-786: encoder.* HF vision tower + cls_head.* +
    decoder.* SegFormerStrongDecoder) into a tpudf MTL param bundle
    (models/segformer.init_mtl layout). Handles the compiled-model
    `_orig_mod.` prefix (siglip2siddataset.py:1147-1156)."""
    sd = {k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k: v
          for k, v in sd.items()}
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    backbone = from_hf_state_dict(enc, mtl_cfg.backbone)

    def np_(k):
        return _np(sd[k])

    # cls head: plain Linear or Dropout+Linear sequential
    if "cls_head.weight" in sd:
        cw, cb = np_("cls_head.weight"), np_("cls_head.bias")
    else:
        cw, cb = np_("cls_head.1.weight"), np_("cls_head.1.bias")

    k = len(mtl_cfg.seg_layers)
    dec = {
        "projs": [{"w": jnp.asarray(np_(f"decoder.projs.{i}.proj.weight").T),
                   "b": jnp.asarray(np_(f"decoder.projs.{i}.proj.bias"))}
                  for i in range(k)],
        "smooth": [{
            "dw": {"w": jnp.asarray(np_(f"decoder.smooth.{i}.0.weight")
                                    .transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(np_(f"decoder.smooth.{i}.0.bias"))},
            "pw": {"w": jnp.asarray(np_(f"decoder.smooth.{i}.1.weight")
                                    .transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(np_(f"decoder.smooth.{i}.1.bias"))},
        } for i in range(k)],
        "attn1": {"w": jnp.asarray(np_("decoder.fuse_attn.0.weight")
                                   .transpose(2, 3, 1, 0)),
                  "b": jnp.asarray(np_("decoder.fuse_attn.0.bias"))},
        "attn2": {"w": jnp.asarray(np_("decoder.fuse_attn.2.weight")
                                   .transpose(2, 3, 1, 0)),
                  "b": jnp.asarray(np_("decoder.fuse_attn.2.bias"))},
        "fuse": {"w": jnp.asarray(np_("decoder.fuse.0.weight")
                                  .transpose(2, 3, 1, 0)),
                 "b": jnp.asarray(np_("decoder.fuse.0.bias"))},
        "head": {"w": jnp.asarray(np_("decoder.head.weight")
                                  .transpose(2, 3, 1, 0)),
                 "b": jnp.asarray(np_("decoder.head.bias"))},
    }
    return {"backbone": backbone,
            "cls_head": {"w": jnp.asarray(cw.T), "b": jnp.asarray(cb)},
            "decoder": dec}


def from_open_clip_state_dict(sd: Mapping, cfg: SigLIPConfig) -> dict:
    """Convert an open_clip SigLIP vision tower (timm ViT naming:
    `trunk.patch_embed.proj.*`, `trunk.blocks.N.attn.qkv.*`,
    `trunk.attn_pool.*`). Accepts full-CLIP dicts (keys under `visual.`)."""
    sd = {k: _np(v) for k, v in _strip_prefix(sd).items()}
    sd = {re.sub(r"^trunk\.", "", k): v for k, v in sd.items()}
    w, p = cfg.width, cfg.patch_size

    conv = sd["patch_embed.proj.weight"]
    kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, w)
    pos = sd["pos_embed"]
    if pos.ndim == 3:
        pos = pos[0]
    params = {"embed": {"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
                        "pos": jnp.asarray(pos)}}

    blocks = []
    for i in range(cfg.layers):
        pre = f"blocks.{i}."
        blocks.append({
            "ln1": {"scale": sd[pre + "norm1.weight"],
                    "bias": sd[pre + "norm1.bias"]},
            "attn": {
                "qkv_w": sd[pre + "attn.qkv.weight"].T,
                "qkv_b": sd[pre + "attn.qkv.bias"],
                "out_w": sd[pre + "attn.proj.weight"].T,
                "out_b": sd[pre + "attn.proj.bias"],
            },
            "ln2": {"scale": sd[pre + "norm2.weight"],
                    "bias": sd[pre + "norm2.bias"]},
            "mlp": {
                "fc1_w": sd[pre + "mlp.fc1.weight"].T,
                "fc1_b": sd[pre + "mlp.fc1.bias"],
                "fc2_w": sd[pre + "mlp.fc2.weight"].T,
                "fc2_b": sd[pre + "mlp.fc2.bias"],
            },
        })
    import jax
    params["blocks"] = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)
    params["post_ln"] = {"scale": jnp.asarray(sd["norm.weight"]),
                         "bias": jnp.asarray(sd["norm.bias"])}

    if "attn_pool.latent" in sd and cfg.with_head:
        # timm AttentionPoolLatent: latent (1,1,W), separate q / fused kv
        qw = sd["attn_pool.q.weight"].T
        qb = sd["attn_pool.q.bias"]
        kvw = sd["attn_pool.kv.weight"].T          # (W, 2W)
        kvb = sd["attn_pool.kv.bias"]
        params["head"] = {
            "probe": jnp.asarray(sd["attn_pool.latent"].reshape(1, w)),
            "in_w": jnp.asarray(np.concatenate([qw, kvw], axis=1)),
            "in_b": jnp.asarray(np.concatenate([qb, kvb])),
            "out_w": jnp.asarray(sd["attn_pool.proj.weight"].T),
            "out_b": jnp.asarray(sd["attn_pool.proj.bias"]),
            "ln": {"scale": jnp.asarray(sd["attn_pool.norm.weight"]),
                   "bias": jnp.asarray(sd["attn_pool.norm.bias"])},
            "fc1_w": jnp.asarray(sd["attn_pool.mlp.fc1.weight"].T),
            "fc1_b": jnp.asarray(sd["attn_pool.mlp.fc1.bias"]),
            "fc2_w": jnp.asarray(sd["attn_pool.mlp.fc2.weight"].T),
            "fc2_b": jnp.asarray(sd["attn_pool.mlp.fc2.bias"]),
        }
    return params


# ----------------------------------------------------------------- CLI

def _load_state_dict(src: str) -> dict:
    """Load {name: array} from a safetensors file, a torch .pt/.bin, an HF
    model directory, or an HF hub id (network-gated)."""
    import os
    if os.path.isfile(src) and src.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(src))
    if os.path.isfile(src):                 # torch checkpoint
        import torch
        obj = torch.load(src, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj.get("model", obj)) \
            if isinstance(obj, dict) else obj
        return {k: _np(v) for k, v in sd.items()}
    if os.path.isdir(src):
        st = [f for f in os.listdir(src) if f.endswith(".safetensors")]
        if st:
            from safetensors.numpy import load_file
            sd = {}
            for f in sorted(st):
                sd.update(load_file(os.path.join(src, f)))
            return sd
        raise FileNotFoundError(f"no safetensors under {src}")
    # HF hub id — requires network; the caller's environment gates this
    from transformers import SiglipVisionModel
    model = SiglipVisionModel.from_pretrained(src)
    return {k: _np(v) for k, v in model.state_dict().items()}


def _detect_kind(sd: Mapping) -> str:
    keys = set(sd)
    stripped = set(_strip_prefix(sd))
    if any(k.startswith(("encoder.layers.", "_orig_mod.encoder."))
           or k.startswith("cls_head.") for k in keys):
        if any(k.startswith(("decoder.", "_orig_mod.decoder.")) for k in keys):
            return "mtl"
    if any(k.startswith(("trunk.", "patch_embed.")) for k in stripped):
        return "open_clip"
    return "hf"


def _infer_config(sd: Mapping) -> SigLIPConfig:
    """Geometry from the converted-source dict (checkpoint shape
    auto-detection, inference_ai_human_images.py:804-827 family)."""
    sd = {re.sub(r"^trunk\.", "", k): v for k, v in _strip_prefix(sd).items()}
    if "embeddings.patch_embedding.weight" in sd:
        conv = np.asarray(sd["embeddings.patch_embedding.weight"])
        pos = np.asarray(sd["embeddings.position_embedding.weight"])
        layers = 1 + max(int(m.group(1)) for k in sd
                         if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
        mlp = np.asarray(sd["encoder.layers.0.mlp.fc1.weight"]).shape[0]
    else:
        conv = np.asarray(sd["patch_embed.proj.weight"])
        pos = np.asarray(sd["pos_embed"])
        pos = pos[0] if pos.ndim == 3 else pos
        layers = 1 + max(int(m.group(1)) for k in sd
                         if (m := re.match(r"blocks\.(\d+)\.", k)))
        mlp = np.asarray(sd["blocks.0.mlp.fc1.weight"]).shape[0]
    width, _, p, _ = conv.shape
    n_tok = pos.shape[0]
    image_size = int(round(n_tok ** 0.5)) * p
    # SigLIP family head counts: 64-dim heads except so400m (1152/16=72)
    heads = {768: 12, 1024: 16, 1152: 16}.get(width, max(width // 64, 1))
    return SigLIPConfig(width=width, layers=layers, heads=heads,
                        mlp_dim=mlp, image_size=image_size, patch_size=p)


def main(argv=None):
    import argparse
    import dataclasses
    import json
    import os

    ap = argparse.ArgumentParser(
        description="Convert HF/open_clip SigLIP weights to a tpudf orbax "
                    "checkpoint (+ config.json sidecar).")
    ap.add_argument("--src", required=True,
                    help="HF dir / hub id / .safetensors / torch .pt")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--kind", default="auto",
                    choices=["auto", "hf", "open_clip", "mtl"])
    ap.add_argument("--seg_layers", default="0,5,11",
                    help="MTL only: comma-separated tap layers")
    ap.add_argument("--embed_dim", type=int, default=512,
                    help="MTL only: decoder embed dim")
    args = ap.parse_args(argv)

    sd = _load_state_dict(args.src)
    kind = _detect_kind(sd) if args.kind == "auto" else args.kind
    if kind == "mtl":
        from tpudf.models.segformer import MTLConfig
        enc = {k: v for k, v in sd.items()
               if k.startswith(("encoder.", "_orig_mod.encoder."))}
        bb_cfg = _infer_config(
            {k.split("encoder.", 1)[1]: v for k, v in enc.items()})
        cfg = MTLConfig(backbone=bb_cfg,
                        seg_layers=tuple(int(s) for s in
                                         args.seg_layers.split(",")),
                        embed_dim=args.embed_dim)
        params = from_reference_mtl_state_dict(sd, cfg)
        cfg_json = {"kind": "mtl",
                    "backbone": dataclasses.asdict(bb_cfg),
                    "seg_layers": list(cfg.seg_layers),
                    "embed_dim": cfg.embed_dim}
    else:
        cfg = _infer_config(sd)
        params = (from_hf_state_dict(sd, cfg) if kind == "hf"
                  else from_open_clip_state_dict(sd, cfg))
        cfg_json = {"kind": kind, "backbone": dataclasses.asdict(cfg)}

    os.makedirs(args.out, exist_ok=True)
    from tpudf.train.checkpoint import save_checkpoint
    save_checkpoint(os.path.join(args.out, "params"), params)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(cfg_json, f, indent=2)
    import jax
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"[convert] kind={kind} params={n / 1e6:.1f}M -> {args.out}")


if __name__ == "__main__":
    main()
