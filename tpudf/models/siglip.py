"""SigLIP / SigLIP-2 vision transformer, TPU-first functional JAX.

Re-designs (not ports) the two backbone stacks the reference sits on:
  * open_clip `ViT-L-16-SigLIP-384` etc. (appv3.py:1223, cifake MODEL_CONFIGS
    cifake_binary_classifier.py:547-572)
  * HF `SiglipVisionModel` (siglip2siddataset.py:753) including
    `interpolate_pos_encoding=True` variable-resolution support
    (siglip2siddataset.py:770) and per-layer hidden states for the
    segmentation decoder (siglip2siddataset.py:765-785).

TPU-first choices:
  * NHWC pixel layout; patch embedding as patchify-reshape + one big matmul
    (maps directly onto the MXU; no conv lowering required).
  * Fused QKV projection — one (B,S,W)@(W,3W) matmul instead of three.
  * Attention through the Pallas fused kernel (tpudf/ops/attention.py).
  * bf16 matmul compute, f32 layer norms/softmax (core/precision.py policy).
  * Pure functions over a params pytree: trivially jittable, shardable with
    pjit, differentiable, and checkpointable with orbax.

Weight layout conventions (all matmul weights stored (in, out)):
  params = {
    "embed": {"kernel": (p*p*3, W) flattened (kh,kw,c), "bias": (W,),
               "pos": (N, W)},
    "blocks": [  # stacked: each leaf has leading axis L (scan-friendly)
      {"ln1": {"scale","bias"}, "attn": {"qkv_w": (W,3W), "qkv_b": (3W,),
       "out_w": (W,W), "out_b": (W,)},
       "ln2": {...}, "mlp": {"fc1_w","fc1_b","fc2_w","fc2_b"}}],
    "post_ln": {"scale","bias"},
    "head": {"probe": (1,W), "in_w": (W,3W), "in_b": (3W,), "out_w": (W,W),
             "out_b": (W,), "ln": {...}, "fc1_w","fc1_b","fc2_w","fc2_b"},
  }
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from tpudf.core.precision import Policy, DEFAULT_POLICY
from tpudf.ops.attention import attention, attention_qkv


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    image_size: int = 256
    patch_size: int = 16
    ln_eps: float = 1e-6
    with_head: bool = True          # MAP attention-pooling head
    remat: bool = False             # jax.checkpoint each block (training)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# The four backbone sizes the reference trains/serves
# (cifake_binary_classifier.py:547-572 MODEL_CONFIGS + appv3.py:1223).
CONFIGS = {
    "base-256": SigLIPConfig(768, 12, 12, 3072, 256, 16),
    "base-384": SigLIPConfig(768, 12, 12, 3072, 384, 16),
    "large-384": SigLIPConfig(1024, 24, 16, 4096, 384, 16),
    "so400m-512": SigLIPConfig(1152, 27, 16, 4304, 512, 16),
    # tiny config for tests
    "test-32": SigLIPConfig(64, 2, 2, 128, 32, 16),
    # tiny config with a REAL token grid (8x8 = 64 tokens): ToMe schedules
    # actually merge here (test-32's 4 tokens sit below the merge floor, so
    # it cannot exercise token merging) — used by the end-task speed-mode
    # certification in tests/test_train_infer_e2e.py
    "test-64": SigLIPConfig(64, 2, 2, 128, 64, 8),
}


# ---------------------------------------------------------------- init

def _dense_init(key, fan_in, shape):
    return jax.random.normal(key, shape, jnp.float32) * (fan_in ** -0.5)


def _ln_init(width):
    return {"scale": jnp.ones((width,), jnp.float32),
            "bias": jnp.zeros((width,), jnp.float32)}


def init_siglip(key, cfg: SigLIPConfig):
    """Random-init parameter pytree (layout above)."""
    w, pd = cfg.width, cfg.patch_size * cfg.patch_size * 3
    keys = iter(jax.random.split(key, 16 + cfg.layers * 8))
    params: dict[str, Any] = {
        "embed": {
            "kernel": _dense_init(next(keys), pd, (pd, w)),
            "bias": jnp.zeros((w,), jnp.float32),
            "pos": jax.random.normal(next(keys), (cfg.num_patches, w)) * 0.02,
        },
    }

    def block():
        return {
            "ln1": _ln_init(w),
            "attn": {
                "qkv_w": _dense_init(next(keys), w, (w, 3 * w)),
                "qkv_b": jnp.zeros((3 * w,), jnp.float32),
                "out_w": _dense_init(next(keys), w, (w, w)),
                "out_b": jnp.zeros((w,), jnp.float32),
            },
            "ln2": _ln_init(w),
            "mlp": {
                "fc1_w": _dense_init(next(keys), w, (w, cfg.mlp_dim)),
                "fc1_b": jnp.zeros((cfg.mlp_dim,), jnp.float32),
                "fc2_w": _dense_init(next(keys), cfg.mlp_dim, (cfg.mlp_dim, w)),
                "fc2_b": jnp.zeros((w,), jnp.float32),
            },
        }

    blocks = [block() for _ in range(cfg.layers)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params["post_ln"] = _ln_init(w)
    if cfg.with_head:
        params["head"] = {
            "probe": jax.random.normal(next(keys), (1, w)) * 0.02,
            "in_w": _dense_init(next(keys), w, (w, 3 * w)),
            "in_b": jnp.zeros((3 * w,), jnp.float32),
            "out_w": _dense_init(next(keys), w, (w, w)),
            "out_b": jnp.zeros((w,), jnp.float32),
            "ln": _ln_init(w),
            "fc1_w": _dense_init(next(keys), w, (w, cfg.mlp_dim)),
            "fc1_b": jnp.zeros((cfg.mlp_dim,), jnp.float32),
            "fc2_w": _dense_init(next(keys), cfg.mlp_dim, (cfg.mlp_dim, w)),
            "fc2_b": jnp.zeros((w,), jnp.float32),
        }
    return params


# ---------------------------------------------------------------- forward

def layer_norm(x, p, eps):
    """f32-statistics layer norm regardless of compute dtype.

    On TPU with bf16 activations this dispatches to the Pallas fused kernel
    (ops/layernorm.py — one HBM read + one write); elsewhere a single-pass
    E[x^2]-E[x]^2 formulation that XLA fuses well."""
    if x.dtype == jnp.bfloat16 and x.shape[-1] % 128 == 0:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        if on_tpu:
            from tpudf.ops.layernorm import layer_norm_fused
            return layer_norm_fused(x, p["scale"], p["bias"], eps)
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jax.lax.square(mu), 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dt)


def gelu_tanh(x):
    # matches `gelu_pytorch_tanh` used by SigLIP (HF config hidden_act)
    return jax.nn.gelu(x, approximate=True)


def patchify(pixels, patch):
    """(B, H, W, 3) NHWC → (B, N, patch*patch*3) flattened (kh, kw, c)."""
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, gh, gw, kh, kw, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def patch_embed(pixels, kernel, bias, patch):
    """(B, H, W, 3) → (B, N, W): patch extraction + projection as ONE
    strided conv. XLA's TPU conv lowering does the space-to-depth inside
    its implicit GEMM — the explicit patchify reshape/transpose costs ~2.4
    ms of relayouts per 1024-image batch at 256px (measured 6.0 -> 3.6 ms).
    kernel: (patch*patch*3, W) in patchify's (kh, kw, c) flattening order."""
    b, h, w, _ = pixels.shape
    k = kernel.reshape(patch, patch, 3, -1)               # HWIO
    # no preferred_element_type: a widened output dtype breaks the conv VJP
    # (cotangent f32 vs bf16 operands); XLA accumulates bf16 convs in f32
    # internally regardless
    y = jax.lax.conv_general_dilated(
        pixels, k.astype(pixels.dtype), window_strides=(patch, patch),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gh, gw = h // patch, w // patch
    return y.reshape(b, gh * gw, -1) + bias.astype(pixels.dtype)


def _bicubic_matrix(src: int, dst: int) -> jnp.ndarray:
    """(dst, src) interpolation matrix matching torch F.interpolate
    mode='bicubic', align_corners=False, antialias=False (cubic convolution
    kernel a=-0.75, border-replicate). Static — baked into the jitted graph."""
    import numpy as np
    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    m = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        c = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(c))
        t = c - x0
        for tap, dist in zip(range(x0 - 1, x0 + 3),
                             (1 + t, t, 1 - t, 2 - t)):
            m[i, min(max(tap, 0), src - 1)] += k(dist)
    return jnp.asarray(m, jnp.float32)


def interpolate_pos(pos, src_grid: int, dst_hw: tuple[int, int]):
    """Bicubic position-embedding interpolation for variable resolution,
    numerically matching HF interpolate_pos_encoding=True
    (ref: siglip2siddataset.py:770)."""
    n, w = pos.shape
    grid = pos.reshape(src_grid, src_grid, w)
    mh = _bicubic_matrix(src_grid, dst_hw[0])
    mw = _bicubic_matrix(src_grid, dst_hw[1])
    out = jnp.einsum("ij,jkc->ikc", mh, grid,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("kj,ijc->ikc", mw, out,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(dst_hw[0] * dst_hw[1], w)


def _mha(x_q, x_kv, heads, in_w, in_b, out_w, out_b, *, policy,
         interpret=False, logit_bias=None):
    """Generic multi-head attention with fused input projection.

    x_q: (B, Sq, W); x_kv: (B, Skv, W). Query/key/value projections come from
    the same fused (W, 3W) weight (columns [q | k | v]).

    logit_bias: optional (B, Skv) per-key additive logit bias — lets the
    MAP pooling head weight merged tokens by size under ToMe (ops/tome.py).
    """
    b, sq, w = x_q.shape
    skv = x_kv.shape[1]
    d = w // heads
    wq, wk, wv = in_w[:, :w], in_w[:, w:2 * w], in_w[:, 2 * w:]
    bq, bk, bv = in_b[:w], in_b[w:2 * w], in_b[2 * w:]
    if sq == 1:
        # Single-query (MAP probe) fast path — same math, no 4D
        # transposes or (1, d) micro-matmuls, which cost ~2.4 ms/256-batch
        # through the generic path (long-chain measured) vs ~0.05 ms of
        # actual FLOPs. One fused (W, 2W) k/v projection; scores and the
        # value mix are per-head segment reductions on the VPU.
        q = (x_q[:, 0] @ wq + bq).reshape(b, heads, 1, d)      # (B, H, 1, d)
        kv = x_kv.reshape(b * skv, w) @ in_w[:, w:] + in_b[w:]
        kv = kv.reshape(b, skv, 2, heads, d)
        k, v = kv[:, :, 0], kv[:, :, 1]                        # (B, S, H, d)
        logits = jnp.sum(
            k.astype(jnp.float32) * q[:, :, 0].astype(jnp.float32)[:, None],
            axis=-1) * (d ** -0.5)                             # (B, S, H)
        if logit_bias is not None:
            logits = logits + logit_bias[:, :, None].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=1)
        o = jnp.sum(v.astype(jnp.float32) * probs[..., None], axis=1)
        o = o.reshape(b, 1, w).astype(x_q.dtype)
        return o @ out_w + out_b
    q = (x_q @ wq + bq).reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
    k = (x_kv @ wk + bk).reshape(b, skv, heads, d).transpose(0, 2, 1, 3)
    v = (x_kv @ wv + bv).reshape(b, skv, heads, d).transpose(0, 2, 1, 3)
    if logit_bias is None:
        o = attention(q, k, v, interpret=interpret)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        logits = logits + logit_bias[:, None, None, :].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, sq, w)
    return o @ out_w + out_b


def _block_apply(x, bp, cfg: SigLIPConfig, policy: Policy, interpret,
                 logit_bias=None, emit_sumsq=False):
    """emit_sumsq=True → returns (out, (B, S) row sum-of-squares) for the
    ToMe merge that follows (ops/tome.merge_step): the deployed FPP int8
    path emits it from the fused MLP kernel's epilogue (free row norms —
    the tile is already in VMEM); every other variant computes it
    externally so callers see one interface."""
    out = _block_apply_impl(x, bp, cfg, policy, interpret, logit_bias,
                            emit_sumsq)
    if emit_sumsq and not isinstance(out, tuple):
        o32 = out.astype(jnp.float32)
        out = (out, jnp.sum(o32 * o32, axis=-1))
    return out


def _block_apply_impl(x, bp, cfg: SigLIPConfig, policy: Policy, interpret,
                      logit_bias=None, emit_sumsq=False):
    from tpudf.ops.quant import int8_matmul, is_quantized
    quant = is_quantized(bp)
    if not quant:
        # fully fused sublayers: LN1+QKV, attention, out-proj+residual,
        # LN2+MLP+residual — intermediate activations never round-trip HBM
        # beyond the qkv/attention buffers
        from tpudf.ops.linear import linear_fused
        from tpudf.ops.mlp import mlp_block_fused
        d = cfg.head_dim
        qkv_w, qkv_b = bp["attn"]["qkv_w"], bp["attn"]["qkv_b"]
        out_w = bp["attn"]["out_w"]
        lane_ok = (d % 128 == 0) or (128 % d == 0)
        if not lane_ok:
            # lane-align heads by zero-padding each head's slot in the
            # projection WEIGHTS (so400m d=72 → 128): scores/outputs are
            # unchanged (padded dims contribute zeros) but the fused
            # attention kernel applies. Weight pads are tiny vs activations.
            dp = ((d + 127) // 128) * 128
            scale = d ** -0.5          # keep the original softmax scale
            w_ = qkv_w.shape[0]
            qkv_w = jnp.pad(
                qkv_w.reshape(w_, 3, cfg.heads, d),
                ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(
                    w_, 3 * cfg.heads * dp)
            qkv_b = jnp.pad(
                qkv_b.reshape(3, cfg.heads, d),
                ((0, 0), (0, 0), (0, dp - d))).reshape(-1)
            out_w = jnp.pad(
                out_w.reshape(cfg.heads, d, w_),
                ((0, 0), (0, dp - d), (0, 0))).reshape(cfg.heads * dp, w_)
            d_run = dp
        else:
            scale = None
            d_run = d
        qkv = linear_fused(x, qkv_w, qkv_b,
                           ln=(bp["ln1"]["scale"], bp["ln1"]["bias"]),
                           eps=cfg.ln_eps, interpret=interpret)
        o = attention_qkv(qkv, cfg.heads, d_run, scale, interpret=interpret,
                          logit_bias=logit_bias)
        x = linear_fused(o, out_w, bp["attn"]["out_b"],
                         residual=x, interpret=interpret)
        return mlp_block_fused(x, bp["ln2"], bp["mlp"], cfg.ln_eps,
                               interpret=interpret)
    from tpudf.ops.quant import is_static_quantized
    if is_static_quantized(bp):
        # W8A8 with calibrated per-tensor activation scales: three fused
        # Pallas kernels per layer (ops/int8_block.py) — every quantize
        # lives in an MXU kernel's prologue/epilogue, int8 weights stay
        # VMEM-resident, all four projections at the 2x int8 MXU rate
        import os
        from tpudf.ops.int8_block import (attn_out_int8, attn_sublayer_int8,
                                          ln_qkv_int8)
        from tpudf.ops.layernorm import layer_norm_quant
        from tpudf.ops.mlp import mlp_block_fused_int8
        from tpudf.ops.quant import int8_matmul_pre, int8_matmul_static
        sc = bp["act_scales"]
        d = cfg.head_dim
        heads = cfg.heads
        qkv_wq, qkv_b = bp["attn"]["qkv_w"], bp["attn"]["qkv_b"]
        out_wq = bp["attn"]["out_w"]
        attn_scale = None
        if not (d % 128 == 0 or 128 % d == 0):
            # lane-align heads by zero-padding each head's slot in the INT8
            # weights (so400m d=72 → 128), exactly as the bf16 path above:
            # padded dims contribute zero scores/outputs; per-column weight
            # scales pad with 1 (their columns are all-zero anyway).
            # quant.prepad_siglip_static does these pads ONCE at quantize
            # time (the shape check below skips them here); this in-graph
            # fallback keeps un-prepadded param trees working.
            dp = ((d + 127) // 128) * 128
            attn_scale = d ** -0.5
            w_ = qkv_wq["q"].shape[0]
            if not qkv_wq["q"].shape[1] == 3 * heads * dp:
                qkv_wq = {
                    "q": jnp.pad(
                        qkv_wq["q"].reshape(w_, 3, heads, d),
                        ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(
                            w_, 3 * heads * dp),
                    "scale": jnp.pad(
                        qkv_wq["scale"].reshape(3, heads, d),
                        ((0, 0), (0, 0), (0, dp - d)),
                        constant_values=1.0).reshape(-1),
                }
                qkv_b = jnp.pad(qkv_b.reshape(3, heads, d),
                                ((0, 0), (0, 0), (0, dp - d))).reshape(-1)
                out_wq = {
                    "q": jnp.pad(out_wq["q"].reshape(heads, d, w_),
                                 ((0, 0), (0, dp - d), (0, 0))).reshape(
                                     heads * dp, w_),
                    "scale": out_wq["scale"],
                }
            d = dp
        bp = dict(bp)
        bp["attn"] = {"qkv_w": qkv_wq, "qkv_b": qkv_b,
                      "out_w": out_wq, "out_b": bp["attn"]["out_b"]}
        inter = bp["mlp"]["fc1_w"]["q"].shape[-1]
        if inter % 128:
            # lane-align the MLP hidden dim (so400m inter=4304 → 4352) so
            # the fused int8 MLP kernel applies: zero fc1 columns give
            # gelu(0)=0 hidden entries which the zero fc2 rows then ignore —
            # exact algebra, same trick as the head padding above. Scale
            # pads with 1 (their columns are all-zero anyway).
            ip = ((inter + 127) // 128) * 128
            m = bp["mlp"]
            bp["mlp"] = {
                "fc1_w": {"q": jnp.pad(m["fc1_w"]["q"],
                                       ((0, 0), (0, ip - inter))),
                          "scale": jnp.pad(m["fc1_w"]["scale"],
                                           (0, ip - inter),
                                           constant_values=1.0)},
                "fc1_b": jnp.pad(m["fc1_b"], (0, ip - inter)),
                "fc2_w": {"q": jnp.pad(m["fc2_w"]["q"],
                                       ((0, ip - inter), (0, 0))),
                          "scale": m["fc2_w"]["scale"]},
                "fc2_b": m["fc2_b"],
            }
        # measured on v5e, base-256 B=256: FPP 5027 img/s (fused attention
        # sublayer + MLP kernel), LLL 5009 (whole-layer megakernel),
        # PPP 4439, XXX 3998. FPP default; LLL kept for other geometries.
        variant = os.environ.get("TPUDF_INT8_KERNELS", "FPP")
        if variant == "LLL" and logit_bias is not None:
            variant = "FPP"      # whole-layer kernel has no logit-bias input
        if variant == "LLL":
            # whole-layer megakernel: one HBM read + one write per layer
            from tpudf.ops.int8_block import siglip_layer_int8
            out = siglip_layer_int8(x, bp, heads, d, cfg.ln_eps,
                                    attn_scale, interpret=interpret)
            if out is not None:
                return out
            variant = "FPP"
        if variant[0] == "F":
            # single-kernel attention sublayer: QKV never touches HBM
            x = attn_sublayer_int8(
                x, bp["ln1"], bp["attn"]["qkv_w"], bp["attn"]["qkv_b"],
                bp["attn"]["out_w"], bp["attn"]["out_b"], sc["qkv"],
                sc["out"], heads, d, cfg.ln_eps, attn_scale,
                logit_bias=logit_bias, interpret=interpret)
        else:
            if variant[0] == "P":
                qkv = ln_qkv_int8(x, bp["ln1"], bp["attn"]["qkv_w"],
                                  bp["attn"]["qkv_b"], sc["qkv"], cfg.ln_eps,
                                  interpret=interpret)
            else:
                hq = layer_norm_quant(x, bp["ln1"]["scale"],
                                      bp["ln1"]["bias"], sc["qkv"],
                                      cfg.ln_eps, interpret=interpret)
                qkv = (int8_matmul_pre(hq, bp["attn"]["qkv_w"], sc["qkv"])
                       + bp["attn"]["qkv_b"]).astype(x.dtype)
            if variant[1] == "P":
                x = attn_out_int8(qkv, x, bp["attn"]["out_w"],
                                  bp["attn"]["out_b"], sc["out"], heads,
                                  d, attn_scale, logit_bias=logit_bias,
                                  interpret=interpret)
            else:
                o = attention_qkv(qkv, heads, d, attn_scale,
                                  interpret=interpret,
                                  logit_bias=logit_bias)
                x = x + (int8_matmul_static(o, bp["attn"]["out_w"],
                                            sc["out"]) + bp["attn"]["out_b"])
        if variant[2] == "P":
            return mlp_block_fused_int8(
                x, bp["ln2"], bp["mlp"],
                {"fc1": sc["fc1"], "fc2": sc["fc2"]},
                cfg.ln_eps, interpret=interpret, emit_sumsq=emit_sumsq)
        hq = layer_norm_quant(x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                              sc["fc1"], cfg.ln_eps, interpret=interpret)
        h = gelu_tanh(int8_matmul_pre(hq, bp["mlp"]["fc1_w"], sc["fc1"])
                      + bp["mlp"]["fc1_b"])
        return x + (int8_matmul_static(h, bp["mlp"]["fc2_w"], sc["fc2"])
                    + bp["mlp"]["fc2_b"])
    mm_ = lambda a, w: int8_matmul(a, w, a.dtype)
    h = layer_norm(x, bp["ln1"], cfg.ln_eps)
    qkv = mm_(h, bp["attn"]["qkv_w"]) + bp["attn"]["qkv_b"]
    o = attention_qkv(qkv, cfg.heads, cfg.head_dim, interpret=interpret,
                      logit_bias=logit_bias)
    x = x + (mm_(o, bp["attn"]["out_w"]) + bp["attn"]["out_b"])
    h = layer_norm(x, bp["ln2"], cfg.ln_eps)
    h = gelu_tanh(mm_(h, bp["mlp"]["fc1_w"]) + bp["mlp"]["fc1_b"])
    x = x + (mm_(h, bp["mlp"]["fc2_w"]) + bp["mlp"]["fc2_b"])
    return x


def map_head(tokens, hp, cfg: SigLIPConfig, policy: Policy, interpret=False,
             logit_bias=None):
    """MAP (attention-pooling) head: probe token attends over all patch
    tokens, then LN + MLP residual. Mirrors HF
    SiglipMultiheadAttentionPoolingHead semantics. logit_bias weights
    merged tokens by size under ToMe."""
    b = tokens.shape[0]
    probe = jnp.broadcast_to(hp["probe"][None].astype(tokens.dtype),
                             (b, 1, cfg.width))
    h = _mha(probe, tokens, cfg.heads, hp["in_w"].astype(tokens.dtype),
             hp["in_b"].astype(tokens.dtype), hp["out_w"].astype(tokens.dtype),
             hp["out_b"].astype(tokens.dtype), policy=policy,
             interpret=interpret, logit_bias=logit_bias)
    res = h
    h = layer_norm(h, hp["ln"], cfg.ln_eps)
    h = gelu_tanh(h @ hp["fc1_w"].astype(h.dtype) + hp["fc1_b"].astype(h.dtype))
    h = res + (h @ hp["fc2_w"].astype(h.dtype) + hp["fc2_b"].astype(h.dtype))
    return h[:, 0]


def siglip_forward(params, pixels, cfg: SigLIPConfig,
                   policy: Policy = DEFAULT_POLICY,
                   *, output_hidden_states: bool = False,
                   stop_grad_below: int = 0,
                   frozen_blocks_q=None,
                   tome_r: int = 0,
                   tome_floor: int = 0,
                   interpret: bool = False):
    """Run the vision tower.

    pixels: (B, H, W, 3) float in SigLIP-normalized range, NHWC.
    Returns dict with:
      "tokens":  (B, N, W) post-layernorm patch tokens
      "pooled":  (B, W) MAP-head output (if cfg.with_head)
      "hidden_states": tuple of per-layer outputs (embeddings output first,
        then after each block — HF semantics) when requested.

    tome_r: merge tome_r most-similar token pairs between consecutive
    blocks (ops/tome.py — ToMe, Bolya et al. 2023, with size-weighted
    proportional attention). Inference-only speed lever: ~1.5x tower
    throughput at r=16 on base-256; incompatible with hidden-state taps
    and training (raises). tome_floor: minimum token count the schedule
    may merge down to (0 → the conservative S/4 default; the deployed
    engine passes ops/tome.deployed_floor = S/8).

    stop_grad_below: when training with layers < k frozen (the reference's
    frozen recipe, Siglip2sidafrozen.py:754-770), setting k inserts a
    stop_gradient at the layer-k boundary (and on the frozen layers' hidden
    taps) so XLA dead-code-eliminates the entire backward pass of the frozen
    prefix — ~2x train-step FLOPs saved when most layers are frozen. Zero
    effect on any trainable parameter's gradient.

    frozen_blocks_q: optional stacked static-int8 block slice covering the
    first stop_grad_below layers (train/mtl.quantize_frozen_prefix). The
    frozen prefix then runs the fused W8A8 inference kernels (2x int8 MXU
    rate) — the TPU-native analogue of the reference's 8-bit
    frozen-backbone economy (bitsandbytes, siglip2siddataset.py:1219-1225).
    The tangent is severed BEFORE the prefix (the int8 Pallas kernels
    define no VJP); embeddings are frozen whenever layers are, so this
    changes no trainable gradient beyond the int8 activation rounding.
    """
    b, h, w, _ = pixels.shape
    patch = cfg.patch_size
    gh, gw = h // patch, w // patch

    cdt = policy.compute_dtype
    x = patch_embed(pixels.astype(cdt), params["embed"]["kernel"],
                    params["embed"]["bias"], patch)

    pos = params["embed"]["pos"]
    if (gh, gw) != (cfg.grid, cfg.grid):
        pos = interpolate_pos(pos, cfg.grid, (gh, gw))
    x = x + pos.astype(cdt)

    hidden = [x] if output_hidden_states else None

    blocks = params["blocks"]
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(cdt) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    if tome_r:
        if output_hidden_states or stop_grad_below:
            raise ValueError("tome_r is an inference-only speed mode — "
                             "incompatible with hidden_states/training")
        from tpudf.ops.tome import merge_schedule, merge_step
        # default floor: 1/4 of the starting tokens (64 for base-256) — the
        # conservative choice. The deployed engine passes the measured
        # deeper floor (ops/tome.deployed_floor = S/8; fidelity/throughput
        # sweep in ops/tome.py's header).
        floor = int(tome_floor) if tome_floor else max(8, x.shape[1] // 4)
        sched = merge_schedule(x.shape[1], cfg.layers, int(tome_r),
                               min_tokens=floor)
        sizes = jnp.ones(x.shape[:2], jnp.float32)
        for i in range(cfg.layers):
            bp = cast(jax.tree.map(lambda a: a[i], blocks))
            lb = None if i == 0 else jnp.log(sizes)   # sizes all 1 at layer 0
            merging = i < cfg.layers - 1 and sched[i] > 0
            out = _block_apply(x, bp, cfg, policy, interpret, lb,
                               emit_sumsq=merging)
            if merging:
                x, sumsq = out
                x, sizes = merge_step(x, sizes, sched[i], sumsq=sumsq)
            else:
                x = out
        tokens = layer_norm(x, params["post_ln"], cfg.ln_eps)
        out = {"tokens": tokens, "sizes": sizes}
        if cfg.with_head and "head" in params:
            out["pooled"] = map_head(tokens, params["head"], cfg, policy,
                                     interpret=interpret,
                                     logit_bias=jnp.log(sizes))
        return out

    # lax.scan over stacked block params: single trace/compile of one block
    # (also when hidden states are requested — scan stacks the per-layer
    # outputs, so the MTL path compiles one block instead of L copies and
    # cfg.remat applies per block)
    def body(x, bp):
        bp = cast(bp)
        fn = _block_apply
        if cfg.remat:
            fn = jax.checkpoint(fn, static_argnums=(2, 3, 4))
        y = fn(x, bp, cfg, policy, interpret)
        return y, (y if output_hidden_states else None)

    k = max(0, min(int(stop_grad_below), cfg.layers))
    if k > 0:
        if frozen_blocks_q is not None:
            # frozen prefix on the W8A8 inference kernels: sever the
            # tangent BEFORE the scan — the int8 Pallas kernels have no
            # VJP, and with a zero tangent entering, JAX prunes the
            # prefix's JVP entirely (embeddings are frozen with the layers)
            x = jax.lax.stop_gradient(x)
            lo = frozen_blocks_q
            # the quantized prefix must cover EXACTLY the k frozen layers:
            # a quantize_frozen_prefix(freeze_below=A) tree paired with
            # stop_grad_below=B != A would run layers twice (or skip some)
            # with no error, training on garbage features
            n_frozen = jax.tree.leaves(lo)[0].shape[0]
            if n_frozen != k:
                raise ValueError(
                    f"frozen_blocks_q holds {n_frozen} layers but "
                    f"stop_grad_below={k}; quantize_frozen_prefix and the "
                    "train step must use the same freeze boundary")
        else:
            lo = jax.tree.map(lambda a: a[:k], blocks)
        hi = jax.tree.map(lambda a: a[k:], blocks)
        x, st_lo = jax.lax.scan(body, x, lo)
        x = jax.lax.stop_gradient(x)
        if output_hidden_states:
            hidden[0] = jax.lax.stop_gradient(hidden[0])
            hidden.extend(jax.lax.stop_gradient(st_lo[i]) for i in range(k))
        if k < cfg.layers:
            x, st_hi = jax.lax.scan(body, x, hi)
            if output_hidden_states:
                hidden.extend(st_hi[i] for i in range(cfg.layers - k))
    else:
        x, stacked = jax.lax.scan(body, x, blocks)
        if output_hidden_states:
            hidden.extend(stacked[i] for i in range(cfg.layers))

    tokens = layer_norm(x, params["post_ln"], cfg.ln_eps)
    out = {"tokens": tokens}
    if output_hidden_states:
        out["hidden_states"] = tuple(hidden)
    if cfg.with_head and "head" in params:
        out["pooled"] = map_head(tokens, params["head"], cfg, policy,
                                 interpret=interpret)
    return out
