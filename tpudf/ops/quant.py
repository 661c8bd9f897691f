"""Int8 inference quantization for the SigLIP backbone.

TPU v5e's MXU runs int8 at 2x the bf16 rate; the ViT forward is matmul-bound
after the attention-layout fix, so weight+activation int8 on the four big
projections (qkv / out / fc1 / fc2) is the next speed-of-light step.

Scheme (accuracy-preserving PTQ, standard for ViTs):
  * weights: symmetric per-output-channel int8, folded scale (out,)
  * activations: dynamic symmetric per-row (per-token) int8 computed on the
    fly from the running tile's abs-max
  * accumulation in int32 on the MXU via lax.dot_general, dequantized with
    the outer product of scales.

The quantized matmul is exposed both as plain XLA (int8 dot_general — XLA
lowers this to the int8 MXU path) and used by models/siglip.py when the
param tree carries int8 leaves (see quantize_siglip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """(in, out) f32 → {int8 (in,out), scale (out,)} symmetric per-column."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_activation(x):
    """(..., in) → (int8, row scale (...,))."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x, wq, out_dtype=jnp.bfloat16):
    """x: (..., in) float; wq: quantize_weight dict → (..., out)."""
    xq, xs = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, wq["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * wq["scale"]).astype(out_dtype)


def quantize_siglip(params):
    """Produce an int8 inference param tree: the stacked block projection
    weights become {q, scale}; everything else (LNs, biases, embed, head)
    stays float. Consumed by models/siglip._block_apply via is_quantized."""
    import jax.numpy as jnp
    out = jax.tree.map(lambda x: x, params)  # shallow copy of structure
    blocks = params["blocks"]

    def q_stacked(w):
        # w: (L, in, out) — per-layer, per-column scales
        amax = jnp.max(jnp.abs(w), axis=1)                  # (L, out)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127
                     ).astype(jnp.int8)
        return {"q": q, "scale": scale.astype(jnp.float32)}

    out["blocks"] = {
        "ln1": blocks["ln1"],
        "ln2": blocks["ln2"],
        "attn": {
            "qkv_w": q_stacked(blocks["attn"]["qkv_w"]),
            "qkv_b": blocks["attn"]["qkv_b"],
            "out_w": q_stacked(blocks["attn"]["out_w"]),
            "out_b": blocks["attn"]["out_b"],
        },
        "mlp": {
            "fc1_w": q_stacked(blocks["mlp"]["fc1_w"]),
            "fc1_b": blocks["mlp"]["fc1_b"],
            "fc2_w": q_stacked(blocks["mlp"]["fc2_w"]),
            "fc2_b": blocks["mlp"]["fc2_b"],
        },
    }
    return out


def is_quantized(block_params) -> bool:
    return isinstance(block_params["attn"]["qkv_w"], dict) \
        and "q" in block_params["attn"]["qkv_w"]
