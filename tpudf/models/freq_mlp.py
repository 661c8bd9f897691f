"""Frequency-branch expert MLPs over the 24-d FFT/SRM feature vector.

Two generations exist in the reference:
  * deployed "simple" FreqMLP — SafeLayerNorm(24) → Linear 24→64 → GELU →
    Linear 64→1, with eval-time 0.001·randn smoothing noise
    (appv3.py:1483-1510; shipped artifact siglip/freq_mlp.safetensors with
    keys net.0/net.1/net.3)
  * v5 trainer FreqMLP — FeatureNormalizer → ContrastScaler(tanh) →
    BandGating(4 bands) → 2× residual MLP blocks → linear head →
    TemperatureScaler ("FreqMLP trainer.py":225-305)

Both are pure-JAX here and load the reference safetensors artifacts directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.models.siglip import layer_norm
from tpudf.utils.nn import mm


# ------------------------------------------------------------- simple (v4)

def init_freq_mlp(key, in_dim=24, hid=64):
    k1, k2 = jax.random.split(key)
    s = lambda k, i, o: jax.random.normal(k, (i, o)) * (i ** -0.5)
    return {
        "ln": {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))},
        "fc1": {"w": s(k1, in_dim, hid), "b": jnp.zeros((hid,))},
        "fc2": {"w": s(k2, hid, 1), "b": jnp.zeros((1,))},
    }


def apply_freq_mlp(params, x, noise_rng=None):
    """x: (..., 24) features → (...,) logit.

    noise_rng: when given, injects the reference's eval-time jitter-smoothing
    noise 0.001·N(0,1) (appv3.py:1507-1510) — explicit PRNG instead of global
    RNG state."""
    if noise_rng is not None:
        x = x + 0.001 * jax.random.normal(noise_rng, x.shape, x.dtype)
    x = layer_norm(x, params["ln"], 1e-5)
    x = jax.nn.gelu(mm(x, params["fc1"]["w"]) + params["fc1"]["b"], approximate=False)
    return (mm(x, params["fc2"]["w"]) + params["fc2"]["b"])[..., 0]


def freq_mlp_from_safetensors(path):
    """Load the deployed artifact (keys net.0.{weight,bias} = SafeLayerNorm,
    net.1 = Linear 24→64, net.3 = Linear 64→1)."""
    from safetensors.numpy import load_file
    sd = load_file(path)
    return {
        "ln": {"scale": jnp.asarray(sd["net.0.weight"]),
               "bias": jnp.asarray(sd["net.0.bias"])},
        "fc1": {"w": jnp.asarray(sd["net.1.weight"].T),
                "b": jnp.asarray(sd["net.1.bias"])},
        "fc2": {"w": jnp.asarray(sd["net.3.weight"].T),
                "b": jnp.asarray(sd["net.3.bias"])},
    }


def freq_mlp_v5_from_safetensors(path):
    """Load a v5-trainer artifact ("FreqMLP trainer.py":274-309 layout:
    normer.mean/std buffers, contrast.alpha/beta, band.gates,
    blocks.N.{norm,fc1,fc2}, head, temp.T)."""
    from safetensors.numpy import load_file
    sd = load_file(path)
    blocks = []
    i = 0
    while f"blocks.{i}.fc1.weight" in sd:
        blocks.append({
            "ln": {"scale": jnp.asarray(sd[f"blocks.{i}.norm.weight"]),
                   "bias": jnp.asarray(sd[f"blocks.{i}.norm.bias"])},
            "fc1": {"w": jnp.asarray(sd[f"blocks.{i}.fc1.weight"].T),
                    "b": jnp.asarray(sd[f"blocks.{i}.fc1.bias"])},
            "fc2": {"w": jnp.asarray(sd[f"blocks.{i}.fc2.weight"].T),
                    "b": jnp.asarray(sd[f"blocks.{i}.fc2.bias"])},
        })
        i += 1
    return {
        "norm_mean": jnp.asarray(sd["normer.mean"]),
        "norm_std": jnp.asarray(sd["normer.std"]),
        "contrast": {"alpha": jnp.asarray(sd["contrast.alpha"]),
                     "beta": jnp.asarray(sd["contrast.beta"])},
        "gates": jnp.asarray(sd["band.gates"]),
        "blocks": blocks,
        "head": {"w": jnp.asarray(sd["head.weight"].T),
                 "b": jnp.asarray(sd["head.bias"])},
        "temp": jnp.asarray(sd["temp.T"]).reshape(()),
    }


# ----------------------------------------------------------------- v5

def init_freq_mlp_v5(key, dim=24, hidden=64, num_bands=4):
    ks = iter(jax.random.split(key, 8))
    s = lambda k, i, o: jax.random.normal(k, (i, o)) * (i ** -0.5)

    def block():
        return {
            "ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "fc1": {"w": s(next(ks), dim, hidden), "b": jnp.zeros((hidden,))},
            "fc2": {"w": s(next(ks), hidden, dim), "b": jnp.zeros((dim,))},
        }

    return {
        "norm_mean": jnp.zeros((dim,)),
        "norm_std": jnp.ones((dim,)),
        "contrast": {"alpha": jnp.ones((dim,)), "beta": jnp.zeros((dim,))},
        "gates": jnp.zeros((num_bands,)),
        "blocks": [block(), block()],
        "head": {"w": s(next(ks), dim, 1), "b": jnp.zeros((1,))},
        "temp": jnp.asarray(1.0),
    }


def fit_freq_normalizer(params, feats):
    """FeatureNormalizer.fit ("FreqMLP trainer.py":225-229): buffer mean/std."""
    params = dict(params)
    params["norm_mean"] = jnp.mean(feats, axis=0)
    params["norm_std"] = jnp.std(feats, axis=0, ddof=1) + 1e-6
    return params


def apply_freq_mlp_v5(params, x, dropout_rng=None, dropout=0.05):
    d = x.shape[-1]
    nb = params["gates"].shape[0]
    x = (x - params["norm_mean"]) / (params["norm_std"] + 1e-6)
    x = jnp.tanh(params["contrast"]["alpha"] * x + params["contrast"]["beta"])
    gates = jax.nn.sigmoid(params["gates"])
    x = x * jnp.repeat(gates, d // nb)
    rngs = (jax.random.split(dropout_rng, len(params["blocks"]))
            if dropout_rng is not None else [None] * len(params["blocks"]))
    for blk, rng in zip(params["blocks"], rngs):
        r = x
        h = layer_norm(x, blk["ln"], 1e-5)
        h = jax.nn.gelu(mm(h, blk["fc1"]["w"]) + blk["fc1"]["b"], approximate=False)
        h = mm(h, blk["fc2"]["w"]) + blk["fc2"]["b"]
        if rng is not None and dropout > 0:
            keep = 1.0 - dropout
            h = jnp.where(jax.random.bernoulli(rng, keep, h.shape), h / keep, 0.0)
        x = h + r
    z = (mm(x, params["head"]["w"]) + params["head"]["b"])[..., 0]
    return z / (params["temp"] + 1e-6)
