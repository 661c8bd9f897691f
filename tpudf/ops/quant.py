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


# ------------------------------------------------- static-scale W8A8 path
#
# Measured on the v5e ('axon'): per-ROW dynamic activation quantization eats
# the whole int8 MXU win (full tower +8% only) because the abs-max reduction
# + f32 round/clip costs a full extra activation pass per projection. With a
# STATIC per-tensor activation scale (calibrated offline) the quantize is a
# scalar-mul/round/clip chain XLA fuses into the producing op, and the int8
# dot_general runs at ~2x the bf16 MXU rate (scripts/micro_int8.py).

def int8_matmul_static(x, wq, act_scale, out_dtype=None):
    """x: (..., in) float; wq: quantize_weight dict; act_scale: scalar f32.
    W8A8 with symmetric per-tensor activation scale."""
    out_dtype = out_dtype or x.dtype
    act_scale = act_scale.astype(jnp.float32)          # keep scales exact
    inv = 127.0 / act_scale
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                 -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (act_scale / 127.0)
            * wq["scale"].astype(jnp.float32)).astype(out_dtype)


def int8_matmul_pre(q, wq, act_scale, out_dtype=jnp.bfloat16):
    """Pre-quantized int8 activations (from ops/layernorm.layer_norm_quant)
    x int8 weights → dequantized float output."""
    act_scale = jnp.asarray(act_scale, jnp.float32)
    acc = jax.lax.dot_general(
        q, wq["q"], (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (act_scale / 127.0)
            * wq["scale"].astype(jnp.float32)).astype(out_dtype)


def calibrate_siglip_act_scales(params, cfg, pixels, policy=None):
    """Run the bf16/f32 tower over a calibration batch and record the
    abs-max of each projection's input per layer (standard PTQ calibration).

    Returns {"qkv": (L,), "out": (L,), "fc1": (L,), "fc2": (L,)} f32.
    """
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models import siglip as S

    policy = policy or DEFAULT_POLICY
    cdt = policy.compute_dtype
    b, h, w, _ = pixels.shape
    patch = cfg.patch_size
    gh, gw = h // patch, w // patch

    x = S.patch_embed(pixels.astype(cdt), params["embed"]["kernel"],
                      params["embed"]["bias"], patch)
    pos = params["embed"]["pos"]
    if (gh, gw) != (cfg.grid, cfg.grid):
        pos = S.interpolate_pos(pos, cfg.grid, (gh, gw))
    x = x + pos.astype(cdt)

    scales = {"qkv": [], "out": [], "fc1": [], "fc2": []}
    amax = lambda t: jnp.maximum(jnp.max(jnp.abs(
        t.astype(jnp.float32))), 1e-3)
    for i in range(cfg.layers):
        bp = jax.tree.map(lambda a: a[i].astype(cdt)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a[i],
                          params["blocks"])
        h1 = S.layer_norm(x, bp["ln1"], cfg.ln_eps)
        scales["qkv"].append(amax(h1))
        qkv = h1 @ bp["attn"]["qkv_w"] + bp["attn"]["qkv_b"]
        from tpudf.ops.attention import attention_qkv
        o = attention_qkv(qkv, cfg.heads, cfg.head_dim, use_pallas=False)
        scales["out"].append(amax(o))
        x = x + (o @ bp["attn"]["out_w"] + bp["attn"]["out_b"])
        h2 = S.layer_norm(x, bp["ln2"], cfg.ln_eps)
        scales["fc1"].append(amax(h2))
        g = S.gelu_tanh(h2 @ bp["mlp"]["fc1_w"] + bp["mlp"]["fc1_b"])
        scales["fc2"].append(amax(g))
        x = x + (g @ bp["mlp"]["fc2_w"] + bp["mlp"]["fc2_b"])
    return {k: jnp.stack(v).astype(jnp.float32) for k, v in scales.items()}


def quantize_siglip_static(params, act_scales, cfg=None):
    """Static-activation-scale int8 param tree: quantize_siglip layout plus
    per-layer activation scales under blocks["act_scales"]. Pass cfg to
    also pre-pad the weights for the fused kernels (prepad_siglip_static) —
    otherwise lane-misaligned geometries (so400m) pad per forward."""
    out = quantize_siglip(params)
    out["blocks"]["act_scales"] = {k: jnp.asarray(v, jnp.float32)
                                   for k, v in act_scales.items()}
    if cfg is not None:
        out = prepad_siglip_static(out, cfg)
    return out


def prepad_siglip_static(params, cfg):
    """One-time lane-alignment of the stacked static-int8 weights for the
    fused kernels: zero-pad each head's slot to a 128 lane multiple
    (so400m head_dim 72 → 128) and the MLP hidden dim to a 128 multiple
    (so400m 4304 → 4352). Exact algebra — padded QKV columns produce zero
    scores/outputs, padded fc1 columns give gelu(0)=0 hidden entries which
    the zero fc2 rows ignore (see models/siglip._block_apply, which does
    these same pads per forward when it sees unpadded weights; pre-padding
    removes ~20 MB/layer of runtime jnp.pad HBM traffic). Scales pad with
    1 (their columns are all-zero anyway). No-op for aligned geometries."""
    d, heads = cfg.head_dim, cfg.heads
    blocks = dict(params["blocks"])
    if not (d % 128 == 0 or 128 % d == 0):
        dp = ((d + 127) // 128) * 128
        attn = dict(blocks["attn"])
        qkv = attn["qkv_w"]
        nl, w_, n3 = qkv["q"].shape
        if n3 != 3 * heads * dp:
            pad5 = ((0, 0), (0, 0), (0, 0), (0, 0), (0, dp - d))
            pad4 = ((0, 0), (0, 0), (0, 0), (0, dp - d))
            attn["qkv_w"] = {
                "q": jnp.pad(qkv["q"].reshape(nl, w_, 3, heads, d),
                             pad5).reshape(nl, w_, 3 * heads * dp),
                "scale": jnp.pad(qkv["scale"].reshape(nl, 3, heads, d),
                                 pad4, constant_values=1.0
                                 ).reshape(nl, 3 * heads * dp),
            }
            attn["qkv_b"] = jnp.pad(
                attn["qkv_b"].reshape(nl, 3, heads, d), pad4
            ).reshape(nl, 3 * heads * dp)
            ow = attn["out_w"]
            attn["out_w"] = {
                "q": jnp.pad(ow["q"].reshape(nl, heads, d, w_),
                             ((0, 0), (0, 0), (0, dp - d), (0, 0))
                             ).reshape(nl, heads * dp, w_),
                "scale": ow["scale"],
            }
            blocks["attn"] = attn
    inter = blocks["mlp"]["fc1_w"]["q"].shape[-1]
    if inter % 128:
        ip = ((inter + 127) // 128) * 128
        m = dict(blocks["mlp"])
        m["fc1_w"] = {"q": jnp.pad(m["fc1_w"]["q"],
                                   ((0, 0), (0, 0), (0, ip - inter))),
                      "scale": jnp.pad(m["fc1_w"]["scale"],
                                       ((0, 0), (0, ip - inter)),
                                       constant_values=1.0)}
        m["fc1_b"] = jnp.pad(m["fc1_b"], ((0, 0), (0, ip - inter)))
        m["fc2_w"] = {"q": jnp.pad(m["fc2_w"]["q"],
                                   ((0, 0), (0, ip - inter), (0, 0))),
                      "scale": m["fc2_w"]["scale"]}
        blocks["mlp"] = m
    out = dict(params)
    out["blocks"] = blocks
    return out


def is_static_quantized(block_params) -> bool:
    return is_quantized(block_params) and "act_scales" in block_params
