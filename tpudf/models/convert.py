"""Checkpoint conversion: HF / open_clip SigLIP weights → tpudf pytree.

The reference loads backbones two ways (SURVEY.md §1): open_clip
`create_model_and_transforms(..., pretrained="webli")` (appv3.py:1223) and HF
`SiglipVisionModel.from_pretrained` (siglip2siddataset.py:753). This module
maps either state dict onto the tpudf layout (models/siglip.py docstring).

Works from a plain `{name: np.ndarray}` dict so torch is only needed by the
caller that produced the state dict.
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
