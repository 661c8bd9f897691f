"""Classifier heads over frozen SigLIP features.

Re-implements (TPU-functional, PRNG-explicit) the reference head families:
  * deployed v5 BinaryClassifier head: SE gate + 3-layer MLP over L2-normed
    pooled features (appv3.py:1211-1254)
  * CiFake FastBinaryClassifier heads: tiny/small/medium-large MLP variants
    with L2 norm + LayerNorm + optional single-token self-attention
    (cifake_binary_classifier.py:574-753)
  * HiDF BinaryVideoClassifier head: temporal mean pool + LN + 3-layer
    ReLU MLP (hidf_video_classifier.py:249-320)

All heads are pure functions of (params, features[, rng]); dropout is applied
only when an rng key is provided (training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpudf.models.siglip import layer_norm
from tpudf.utils.nn import mm


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _linear(key, din, dout):
    return {"w": _xavier(key, (din, dout)), "b": jnp.zeros((dout,), jnp.float32)}


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def l2_normalize(f, eps=1e-6):
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + eps)


# ------------------------------------------------------------------ v5 head

def init_binary_head(key, dim: int):
    """Deployed v5 head: SE(dim→dim/16→dim, sigmoid) + LN→MLP(dim→dim/2→dim/4→1)."""
    ks = jax.random.split(key, 5)
    return {
        "se": {"fc1": _linear(ks[0], dim, dim // 16),
               "fc2": _linear(ks[1], dim // 16, dim)},
        "ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "fc1": _linear(ks[2], dim, dim // 2),
        "fc2": _linear(ks[3], dim // 2, dim // 4),
        "fc3": _linear(ks[4], dim // 4, 1),
    }


def apply_binary_head(params, features, rng=None, ln_eps=1e-5, acts=None):
    """features: (B, dim) pooled SigLIP output (pre-normalization).
    Returns (B,) logits. Mirrors appv3.py:1246-1253 semantics: L2-norm →
    SE gate → LN → Drop(.3) → GELU MLP → logit.

    acts: optional dict — when passed, every linear layer's output is
    recorded into it (the functional equivalent of the reference's forward
    hooks, hidf_video_classifier.py:2152-2199; used by eval/analysis.py so
    the activation statistics always describe THIS head math)."""
    rec = (lambda k, v: acts.__setitem__(k, v)) if acts is not None \
        else (lambda k, v: None)
    f = l2_normalize(features)
    se = jax.nn.relu(mm(f, params["se"]["fc1"]["w"]) + params["se"]["fc1"]["b"])
    rec("se_fc1", se)
    se = jax.nn.sigmoid(mm(se, params["se"]["fc2"]["w"]) + params["se"]["fc2"]["b"])
    rec("se_fc2", se)
    x = f * se
    x = layer_norm(x, params["ln"], ln_eps)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    x = _dropout(x, 0.3, r1)
    x = jax.nn.gelu(mm(x, params["fc1"]["w"]) + params["fc1"]["b"], approximate=False)
    rec("fc1", x)
    x = _dropout(x, 0.2, r2)
    x = jax.nn.gelu(mm(x, params["fc2"]["w"]) + params["fc2"]["b"], approximate=False)
    rec("fc2", x)
    out = mm(x, params["fc3"]["w"]) + params["fc3"]["b"]
    rec("fc3", out)
    return out[..., 0]


# ------------------------------------------------------- CiFake fast heads

def init_fast_binary_head(key, dim: int, model_size: str = "small",
                          use_attention: bool = True):
    """CiFake FastBinaryClassifier head family
    (cifake_binary_classifier.py:650-688)."""
    ks = iter(jax.random.split(key, 8))
    p = {"ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
         "size": model_size}
    if use_attention and model_size in ("tiny", "small", "large"):
        p["attn"] = {"qkv": _linear(next(ks), dim, 3 * dim),
                     "proj": _linear(next(ks), dim, dim),
                     "heads": 4 if model_size in ("tiny", "small")
                               else min(8, dim // 64)}
    if model_size == "tiny":
        p["cls"] = [_linear(next(ks), dim, 1)]
    elif model_size == "small":
        p["cls"] = [_linear(next(ks), dim, dim // 4),
                    _linear(next(ks), dim // 4, 1)]
    else:
        p["cls"] = [_linear(next(ks), dim, dim // 2),
                    _linear(next(ks), dim // 2, dim // 4),
                    _linear(next(ks), dim // 4, 1)]
    return p


def _single_token_attention(p, f):
    """Self-attention over a single token (cifake LightweightAttention,
    cifake_binary_classifier.py:574-595). With N=1 the softmax is identity, so
    this reduces to two linear maps of the value path — kept for weight-level
    parity with trained reference heads."""
    heads = p["heads"]
    b, c = f.shape
    d = c // heads
    qkv = mm(f, p["qkv"]["w"]) + p["qkv"]["b"]
    v = qkv[:, 2 * c:]                      # (B, C); attn weights are 1
    return mm(v, p["proj"]["w"]) + p["proj"]["b"]


def apply_fast_binary_head(params, features, rng=None, dropout_rate=0.1):
    f = l2_normalize(features, eps=0.0)
    f = layer_norm(f, params["ln"], 1e-5)
    if "attn" in params:
        f = _single_token_attention(params["attn"], f)
    size = params["size"]
    layers = params["cls"]
    rngs = (jax.random.split(rng, len(layers))
            if rng is not None else [None] * len(layers))
    if size == "tiny":
        f = _dropout(f, dropout_rate * 0.5, rngs[0])
        f = mm(f, layers[0]["w"]) + layers[0]["b"]
    elif size == "small":
        f = jax.nn.gelu(mm(f, layers[0]["w"]) + layers[0]["b"], approximate=False)
        f = _dropout(f, dropout_rate, rngs[0])
        f = mm(f, layers[1]["w"]) + layers[1]["b"]
    else:
        f = jax.nn.gelu(mm(f, layers[0]["w"]) + layers[0]["b"], approximate=False)
        f = _dropout(f, dropout_rate, rngs[0])
        f = jax.nn.gelu(mm(f, layers[1]["w"]) + layers[1]["b"], approximate=False)
        f = _dropout(f, dropout_rate * 0.5, rngs[1])
        f = mm(f, layers[2]["w"]) + layers[2]["b"]
    return f[..., 0]


def fast_head_regularization(params, l1=1e-5, l2=1e-4):
    """L1+L2 penalty on classifier weights (cifake :696-707)."""
    loss = 0.0
    for lin in params["cls"]:
        for leaf in (lin["w"], lin["b"]):
            loss = loss + l1 * jnp.sum(jnp.abs(leaf)) + l2 * jnp.sum(leaf ** 2)
    return loss


# ------------------------------------------------------------- video head

def init_video_head(key, dim: int):
    """HiDF BinaryVideoClassifier head (hidf_video_classifier.py:279-289)."""
    ks = jax.random.split(key, 3)
    return {
        "ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "fc1": _linear(ks[0], dim, dim // 2),
        "fc2": _linear(ks[1], dim // 2, dim // 4),
        "fc3": _linear(ks[2], dim // 4, 1),
    }


def apply_video_head(params, frame_features, rng=None, dropout_rate=0.3,
                     acts=None):
    """frame_features: (B, T, dim) per-frame pooled SigLIP features.
    L2-norm per frame → temporal mean → LN → ReLU MLP → (B,) logits
    (hidf_video_classifier.py:300-320). acts: optional per-layer activation
    capture dict (see apply_binary_head)."""
    rec = (lambda k, v: acts.__setitem__(k, v)) if acts is not None \
        else (lambda k, v: None)
    f = l2_normalize(frame_features, eps=0.0)
    pooled = jnp.mean(f, axis=1)
    x = layer_norm(pooled, params["ln"], 1e-5)
    rngs = (jax.random.split(rng, 3) if rng is not None else [None] * 3)
    x = _dropout(x, dropout_rate, rngs[0])
    x = jax.nn.relu(mm(x, params["fc1"]["w"]) + params["fc1"]["b"])
    rec("fc1", x)
    x = _dropout(x, dropout_rate * 0.67, rngs[1])
    x = jax.nn.relu(mm(x, params["fc2"]["w"]) + params["fc2"]["b"])
    rec("fc2", x)
    out = mm(x, params["fc3"]["w"]) + params["fc3"]["b"]
    rec("fc3", out)
    return out[..., 0]
