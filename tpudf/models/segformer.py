"""SegFormer-style tamper-localization decoder over intermediate ViT layers.

Re-design of the reference's SegFormerStrongDecoder + SigLIP2_MTL
(siglip2siddataset.py:693-786): K tapped hidden-state layers → per-layer
linear projection to embed_dim → token grid → depthwise+pointwise conv
smoothing → concat → channel-attention gate → 1x1 fuse → bilinear upsample to
image size → 1x1 logit head. The 3-class head (real/synthetic/tampered) sits
on the MAP-pooled output.

TPU notes: NHWC layout throughout; depthwise conv via feature_group_count;
upsampling via jax.image.resize (bilinear, non-aligned corners — matches
F.interpolate(align_corners=False)).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from tpudf.core.precision import DEFAULT_POLICY, Policy
from tpudf.models.siglip import SigLIPConfig, siglip_forward
from tpudf.utils.nn import mm


@dataclasses.dataclass(frozen=True)
class MTLConfig:
    backbone: SigLIPConfig
    seg_layers: tuple = (2, 6, 10, -1)   # hidden-state taps (ref default)
    embed_dim: int = 256
    num_classes: int = 3


def _conv_init(key, shape):
    # torch Conv2d default: kaiming-uniform(a=sqrt(5)) ≈ U(±1/sqrt(fan_in))
    fan_in = shape[0] * shape[1] * shape[2]
    bound = (1.0 / fan_in) ** 0.5 if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _conv(key, kh, kw, cin, cout):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = (1.0 / fan_in) ** 0.5
    return {"w": _conv_init(k1, (kh, kw, cin, cout)),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)}


def init_segformer_decoder(key, cfg: MTLConfig):
    w, e = cfg.backbone.width, cfg.embed_dim
    k = len(cfg.seg_layers)
    ks = iter(jax.random.split(key, 4 * k + 8))
    s = lambda kk, i, o: jax.random.normal(kk, (i, o)) * (i ** -0.5)
    return {
        "projs": [{"w": s(next(ks), w, e), "b": jnp.zeros((e,))}
                  for _ in range(k)],
        "smooth": [{"dw": _conv(next(ks), 3, 3, 1, e),   # depthwise (HWIO, I=1)
                    "pw": _conv(next(ks), 1, 1, e, e)}
                   for _ in range(k)],
        "attn1": _conv(next(ks), 1, 1, e * k, (e * k) // 4),
        "attn2": _conv(next(ks), 1, 1, (e * k) // 4, e * k),
        "fuse": _conv(next(ks), 1, 1, e * k, e),
        "head": _conv(next(ks), 1, 1, e, 1),
    }


def _conv2d(x, p, groups=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups) + p["b"]


def apply_segformer_decoder(params, hidden_list: Sequence, grid_hw,
                            target_size: int):
    """hidden_list: K tensors (B, N, W) → (B, target, target) seg logits."""
    h, w = grid_hw
    feats = []
    for proj, smooth, tokens in zip(params["projs"], params["smooth"],
                                    hidden_list):
        x = mm(tokens, proj["w"].astype(tokens.dtype)) + proj["b"].astype(tokens.dtype)
        b, n, e = x.shape
        x = x.reshape(b, h, w, e)
        x = _conv2d(x, jax.tree.map(lambda a: a.astype(x.dtype), smooth["dw"]),
                    groups=e)
        x = _conv2d(x, jax.tree.map(lambda a: a.astype(x.dtype), smooth["pw"]))
        feats.append(jax.nn.gelu(x, approximate=False))
    x = jnp.concatenate(feats, axis=-1)                    # (B,H,W,E*K)
    cast = lambda t: jax.tree.map(lambda a: a.astype(x.dtype), t)
    a = jax.nn.gelu(_conv2d(x, cast(params["attn1"])), approximate=False)
    a = jax.nn.sigmoid(_conv2d(a, cast(params["attn2"])))
    x = _conv2d(a * x, cast(params["fuse"]))
    x = jax.image.resize(x, (x.shape[0], target_size, target_size, x.shape[-1]),
                         method="bilinear")
    x = _conv2d(x, cast(params["head"]))
    return x[..., 0]


def init_mtl(key, cfg: MTLConfig, backbone_params=None):
    """Full MTL bundle: backbone + 3-class head + seg decoder."""
    from tpudf.models.siglip import init_siglip
    k1, k2, k3 = jax.random.split(key, 3)
    if backbone_params is None:
        backbone_params = init_siglip(k1, cfg.backbone)
    s = jax.random.normal(k2, (cfg.backbone.width, cfg.num_classes)) \
        * (cfg.backbone.width ** -0.5)
    return {
        "backbone": backbone_params,
        "cls_head": {"w": s, "b": jnp.zeros((cfg.num_classes,))},
        "decoder": init_segformer_decoder(k3, cfg),
    }


def mtl_forward(params, pixels, cfg: MTLConfig,
                policy: Policy = DEFAULT_POLICY, cls_dropout_rng=None,
                dropout_rate=0.0, stop_grad_below=0, frozen_blocks_q=None):
    """pixels: (B, S, S, 3) → (cls_logits (B,3), seg_logits (B,S,S)).

    Mirrors SigLIP2_MTL.forward (siglip2siddataset.py:777-786): pooled output
    → 3-class head; hidden states at seg_layers (+1 offset, -1 = last) →
    decoder upsampled to the input size. stop_grad_below: see siglip_forward
    — pass the freeze boundary to skip the frozen prefix's backward.
    """
    out = siglip_forward(params["backbone"], pixels, cfg.backbone, policy,
                         output_hidden_states=True,
                         stop_grad_below=stop_grad_below,
                         frozen_blocks_q=frozen_blocks_q)
    pooled = out["pooled"]
    if cls_dropout_rng is not None and dropout_rate > 0:
        keep = 1.0 - dropout_rate
        pooled = jnp.where(
            jax.random.bernoulli(cls_dropout_rng, keep, pooled.shape),
            pooled / keep, 0.0)
    cls_logits = mm(pooled, params["cls_head"]["w"].astype(pooled.dtype)) \
        + params["cls_head"]["b"].astype(pooled.dtype)

    hs = out["hidden_states"]
    last = len(hs) - 1
    idxs = [(i + 1 if i >= 0 else last) for i in cfg.seg_layers]
    feats = [hs[i] for i in idxs]
    n = feats[0].shape[1]
    g = math.isqrt(n)
    seg = apply_segformer_decoder(params["decoder"], feats, (g, g),
                                  pixels.shape[1])
    return cls_logits.astype(jnp.float32), seg.astype(jnp.float32)


def freeze_mask(params, cfg: MTLConfig, freeze_below: int = 21):
    """Frozen-variant mask: True = trainable. Mirrors Siglip2sidafrozen.py:
    754-770 — freeze patch/pos embeddings and encoder layers < freeze_below;
    decoder, cls head, post-LN, MAP head stay trainable."""
    def bb_mask(path_leaf):
        return path_leaf

    layers_trainable = jnp.arange(cfg.backbone.layers) >= freeze_below

    mask = jax.tree.map(lambda _: True, params)
    mask["backbone"]["embed"] = jax.tree.map(
        lambda _: False, mask["backbone"]["embed"])
    # per-layer mask on the stacked block leaves is handled by multiplying
    # gradients; here we return a pytree of bools for optax.masked plus the
    # per-layer vector for the caller.
    return mask, layers_trainable
