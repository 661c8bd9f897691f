"""open_clip/timm-style state-dict conversion test (synthetic weights —
open_clip itself is not installed; we verify the converted tower matches a
direct reimplementation of the timm layout semantics via the HF-equivalent
path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpudf.core.precision import F32_POLICY
from tpudf.models.convert import from_hf_state_dict, from_open_clip_state_dict
from tpudf.models.siglip import SigLIPConfig, siglip_forward

CFG = SigLIPConfig(width=64, layers=2, heads=2, mlp_dim=128, image_size=32,
                   patch_size=16)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.05


def _make_state_dicts(seed=0):
    """Build equivalent HF-style and open_clip/timm-style dicts from the
    same underlying tensors."""
    rng = np.random.default_rng(seed)
    w, p, inter, L = CFG.width, CFG.patch_size, CFG.mlp_dim, CFG.layers
    conv = _rand(rng, w, 3, p, p)
    conv_b = _rand(rng, w)
    pos = _rand(rng, CFG.num_patches, w)
    hf = {
        "embeddings.patch_embedding.weight": conv,
        "embeddings.patch_embedding.bias": conv_b,
        "embeddings.position_embedding.weight": pos,
        "post_layernorm.weight": np.ones(w, np.float32),
        "post_layernorm.bias": np.zeros(w, np.float32),
    }
    oc = {
        "trunk.patch_embed.proj.weight": conv,
        "trunk.patch_embed.proj.bias": conv_b,
        "trunk.pos_embed": pos[None],
        "trunk.norm.weight": np.ones(w, np.float32),
        "trunk.norm.bias": np.zeros(w, np.float32),
    }
    for i in range(L):
        qw, kw, vw = (_rand(rng, w, w) for _ in range(3))
        qb, kb, vb = (_rand(rng, w) for _ in range(3))
        ow, ob = _rand(rng, w, w), _rand(rng, w)
        f1w, f1b = _rand(rng, inter, w), _rand(rng, inter)
        f2w, f2b = _rand(rng, w, inter), _rand(rng, w)
        g1, b1 = np.ones(w, np.float32), np.zeros(w, np.float32)
        g2, b2 = np.ones(w, np.float32), np.zeros(w, np.float32)
        hf.update({
            f"encoder.layers.{i}.layer_norm1.weight": g1,
            f"encoder.layers.{i}.layer_norm1.bias": b1,
            f"encoder.layers.{i}.self_attn.q_proj.weight": qw,
            f"encoder.layers.{i}.self_attn.q_proj.bias": qb,
            f"encoder.layers.{i}.self_attn.k_proj.weight": kw,
            f"encoder.layers.{i}.self_attn.k_proj.bias": kb,
            f"encoder.layers.{i}.self_attn.v_proj.weight": vw,
            f"encoder.layers.{i}.self_attn.v_proj.bias": vb,
            f"encoder.layers.{i}.self_attn.out_proj.weight": ow,
            f"encoder.layers.{i}.self_attn.out_proj.bias": ob,
            f"encoder.layers.{i}.layer_norm2.weight": g2,
            f"encoder.layers.{i}.layer_norm2.bias": b2,
            f"encoder.layers.{i}.mlp.fc1.weight": f1w,
            f"encoder.layers.{i}.mlp.fc1.bias": f1b,
            f"encoder.layers.{i}.mlp.fc2.weight": f2w,
            f"encoder.layers.{i}.mlp.fc2.bias": f2b,
        })
        # timm fused qkv layout: rows stacked [q; k; v]
        oc.update({
            f"trunk.blocks.{i}.norm1.weight": g1,
            f"trunk.blocks.{i}.norm1.bias": b1,
            f"trunk.blocks.{i}.attn.qkv.weight": np.concatenate(
                [qw, kw, vw], axis=0),
            f"trunk.blocks.{i}.attn.qkv.bias": np.concatenate([qb, kb, vb]),
            f"trunk.blocks.{i}.attn.proj.weight": ow,
            f"trunk.blocks.{i}.attn.proj.bias": ob,
            f"trunk.blocks.{i}.norm2.weight": g2,
            f"trunk.blocks.{i}.norm2.bias": b2,
            f"trunk.blocks.{i}.mlp.fc1.weight": f1w,
            f"trunk.blocks.{i}.mlp.fc1.bias": f1b,
            f"trunk.blocks.{i}.mlp.fc2.weight": f2w,
            f"trunk.blocks.{i}.mlp.fc2.bias": f2b,
        })
    return hf, oc


def test_open_clip_matches_hf_conversion():
    hf_sd, oc_sd = _make_state_dicts()
    cfg = SigLIPConfig(**{**CFG.__dict__, "with_head": False})
    p_hf = from_hf_state_dict(hf_sd, cfg)
    p_oc = from_open_clip_state_dict(oc_sd, cfg)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 32, 32, 3)), jnp.float32)
    out_hf = siglip_forward(p_hf, x, cfg, F32_POLICY)["tokens"]
    out_oc = siglip_forward(p_oc, x, cfg, F32_POLICY)["tokens"]
    np.testing.assert_allclose(np.asarray(out_oc), np.asarray(out_hf),
                               atol=1e-5, rtol=1e-5)
