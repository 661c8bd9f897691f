"""Fused W8A8 transformer-block kernels for the static-quantized tower.

With calibrated per-tensor activation scales (ops/quant.py), a SigLIP block
collapses to THREE Pallas kernels per layer:

  K1 ln_qkv_int8:      x --LN--quant--int8 QKV matmul--> qkv   (bf16)
  K2 attn_out_int8:    qkv --attention--quant--int8 out-proj--+x--> x'
  K3 mlp_block_fused_int8 (ops/mlp.py): x' --LN--quant--fc1--gelu--quant
                                        --fc2--+x'--> x''

Every activation-quantization step runs in the epilogue/prologue of an MXU
kernel (no standalone quantize pass ever touches HBM), the int8 weights
(4x smaller than f32) stay VMEM-resident across row tiles, and the four
projections all run at the v5e's 2x int8 MXU rate. This is the TPU-native
replacement for the reference's CUDA Flash-SDPA + cuBLAS path
(cifake_binary_classifier.py:24-27) at inference time.

All kernels have exact XLA twins used off-TPU. Non-lane-aligned head dims
(so400m's 72) are handled by models/siglip zero-padding each head's slot in
the int8 weights to 128 before dispatch (attention width Wa > model width W);
geometries whose working set exceeds VMEM route attention through the
ops/attention Pallas kernel with XLA int8 projections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _on_tpu():
    from tpudf.core.backend import on_tpu
    return on_tpu()


def _quant_rows(y, a):
    return jnp.clip(jnp.round(y * (127.0 / a)), -127, 127).astype(jnp.int8)


# ------------------------------------------------------------------ K1
def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, s_ref, bias_ref, a_ref,
                   o_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[...] + b_ref[...]
    a = a_ref[0]
    q = _quant_rows(y, a)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * ((a / 127.0) * s_ref[...]) + bias_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def _ln_qkv_reference(x2d, g, b, wq, ws, bias, a, eps):
    x32 = x2d.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b
    a = jnp.asarray(a, jnp.float32)
    q = _quant_rows(y, a)
    acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * ((a / 127.0) * ws) + bias
            ).astype(x2d.dtype)


def ln_qkv_int8(x, ln_params, wq_dict, bias, act_scale, eps=1e-6, *,
                block_rows=512, interpret=False):
    """(B, S, W) bf16 → (B, S, 3W) bf16: fused LN + quant + int8 QKV proj."""
    lead, w = x.shape[:-1], x.shape[-1]
    wq, ws = wq_dict["q"], wq_dict["scale"]
    n3 = wq.shape[1]
    args = (ln_params["scale"].astype(jnp.float32),
            ln_params["bias"].astype(jnp.float32),
            wq, ws.astype(jnp.float32), bias.astype(jnp.float32))
    a = jnp.asarray(act_scale, jnp.float32).reshape(1)
    aligned = w % 128 == 0 and n3 % 128 == 0
    fits = w * n3 <= 10 * 1024 * 1024
    x2d = x.reshape(-1, w)
    if not ((_on_tpu() or interpret) and aligned and fits):
        out = _ln_qkv_reference(x2d, *args, a, float(eps))
        return out.reshape(*lead, n3)
    n = x2d.shape[0]
    rows = min(block_rows, n)
    # VMEM per program: int8 weight (w*n3) + f32 accumulator (rows*n3*4) +
    # double-buffered in/out tiles. Wide-n3 geometries (so400m's padded
    # 3*Wa = 6144, est 27 MB) blow the 16 MB scoped limit at rows=512 —
    # shrink the row block until the working set fits. Threshold sits above
    # base-256's 512-row estimate (12.8 MB, known-good at full tiles).
    while rows > 128 and (w * n3 + rows * n3 * 4 + 2 * rows * (w + n3) * 2
                          ) > 14 * 1024 * 1024:
        rows //= 2
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=float(eps)),
        grid=((n + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w, n3), lambda i: (0, 0)),
            pl.BlockSpec((n3,), lambda i: (0,)),
            pl.BlockSpec((n3,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, n3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], n3), x.dtype),
        interpret=interpret,
    )(x2d, *args, a)
    out = out[:n] if pad else out
    return out.reshape(*lead, n3)


# ---------------------------------------------------- K12 (fused sublayer)
def _attn_sublayer_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                          wout_ref, sout_ref, bout_ref, a_ref, *rest,
                          heads, head_dim, scale, eps, group,
                          has_bias=True):
    """`group` images per program: LN → quant → int8 QKV → attention →
    quant → int8 out-proj → residual, entirely in VMEM. The (G·S, 3Wa) QKV
    activation never exists in HBM — at batch 256 that deletes ~0.6 GB of
    traffic per layer versus the separate-kernel form. The attention width
    Wa (= heads*head_dim) may exceed the model width W when heads are
    lane-padded (so400m 72 → 128).

    group > 1 matters in the ToMe small-S regime (tokens merged down to
    S=64): per-image programs would feed the MXU 64-row projection matmuls;
    grouping G=8 images restores 512-row tiles for LN/QKV/out-proj while
    attention itself stays per-image via static row slices."""
    if has_bias:
        ls_ref, o_ref = rest
    else:
        ls_ref, (o_ref,) = None, rest
    gg, s, w = x_ref.shape
    x32 = x_ref[...].astype(jnp.float32).reshape(gg * s, w)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[...] + b_ref[...]
    aq = a_ref[0]
    q8 = _quant_rows(y, aq)
    acc = jax.lax.dot_general(q8, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = acc.astype(jnp.float32) * ((aq / 127.0) * sqkv_ref[...]) \
        + bqkv_ref[...]
    qkv = qkv.astype(jnp.bfloat16)                         # (G·S, 3Wa)
    wa = heads * head_dim
    img_outs = []
    for g in range(group):
        ls = ls_ref[g, 0] if has_bias else None            # (S,) f32 per-key
        qkv_g = qkv[g * s:(g + 1) * s]
        outs = []
        for h in range(heads):
            lo = h * head_dim
            qh = qkv_g[:, lo:lo + head_dim]
            kh = qkv_g[:, wa + lo:wa + lo + head_dim]
            vh = qkv_g[:, 2 * wa + lo:2 * wa + lo + head_dim]
            sc = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale
            if has_bias:            # ToMe proportional attention bias
                sc = sc + ls[None, :]
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jnp.dot(p.astype(vh.dtype), vh,
                                preferred_element_type=jnp.float32))
        img_outs.append(jnp.concatenate(outs, axis=-1))    # (S, Wa) f32
    o = jnp.concatenate(img_outs, axis=0)                  # (G·S, Wa)
    ao = a_ref[1]
    o8 = _quant_rows(o, ao)
    acc2 = jax.lax.dot_general(o8, wout_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    proj = acc2.astype(jnp.float32) * ((ao / 127.0) * sout_ref[...]) \
        + bout_ref[...]
    o_ref[...] = (x32 + proj).astype(o_ref.dtype).reshape(gg, s, w)


def attn_sublayer_int8(x, ln_params, qkv_wq, qkv_b, out_wq, out_b,
                       a_qkv, a_out, heads, head_dim, eps=1e-6,
                       scale=None, *, logit_bias=None, interpret=False):
    """(B, S, W) → (B, S, W): the full attention sublayer as ONE kernel.

    qkv weights may carry lane-padded heads (columns = 3*heads*head_dim
    with head_dim already padded; out weight rows match). Falls back to
    ln_qkv_int8 + attn_out_int8 when the QKV weight or the in-VMEM QKV
    activation would not fit (large geometries), or off-TPU.

    logit_bias: optional (B, S) f32 per-key additive attention-logit bias
    (ToMe proportional attention, ops/tome.py); zeros when absent."""
    b, s, w = x.shape
    wa = heads * head_dim                    # attention width (>= w if padded)
    scale = scale if scale is not None else head_dim ** -0.5
    lane_ok = head_dim % 128 == 0 or 128 % head_dim == 0
    aligned = w % 128 == 0 and wa % 128 == 0 and s % 8 == 0
    assert qkv_wq["q"].shape == (w, 3 * wa), (qkv_wq["q"].shape, w, wa)
    # group several images per program when S is small (ToMe floor): per-
    # image programs would run 64-row projection matmuls; grouping restores
    # ~512-row MXU tiles. Attention stays per-image inside the kernel.
    group = 1
    for g in (16, 8, 4, 2):          # 16 → full 512-row tiles at the S=32
        if b % g == 0 and g * s <= 512:   # deployed-ToMe token floor
            group = g
            break
    # VMEM: qkv weights int8 (3Wa*W) + out (Wa*W) + qkv act (G*S*3Wa bf16)
    #       + scores (S*S f32, sequential per head/image) + concat/x/out
    vmem = (4 * w * wa + group * s * 3 * wa * 2 + s * s * 4
            + 2 * group * s * w * 4 + group * s * wa * 4)
    # above the default 16 MB scoped limit the kernel still fits v5e's
    # 128 MB physical VMEM — raise the Mosaic limit instead of falling back
    # to the split-kernel path (large-384 S=576: est ~17 MB, measured
    # faster fused; cap keeps double-buffering headroom for the x tiles)
    fits = vmem <= 12 * 1024 * 1024
    big_ok = vmem <= 48 * 1024 * 1024
    if (_on_tpu() or interpret) and lane_ok and aligned and big_ok:
        a2 = jnp.stack([jnp.asarray(a_qkv, jnp.float32).reshape(()),
                        jnp.asarray(a_out, jnp.float32).reshape(())])
        # (B, 1, S): Mosaic requires a block's trailing two dims be
        # (8k, 128k) or equal to the array's — (1, S) blocks of a (B, S)
        # array violate that, so the bias rides with a singleton axis.
        # With ToMe off the input is omitted entirely (static has_bias)
        # rather than feeding a zeros array through HBM+DMA every layer.
        has_bias = logit_bias is not None
        kernel = functools.partial(
            _attn_sublayer_kernel, heads=heads, head_dim=head_dim,
            scale=scale, eps=float(eps), group=group, has_bias=has_bias)
        params = None
        if not fits:
            from jax.experimental.pallas import tpu as pltpu
            params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            compiler_params=params,
            grid=(b // group,),
            in_specs=[
                pl.BlockSpec((group, s, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((w, 3 * wa), lambda i: (0, 0)),
                pl.BlockSpec((3 * wa,), lambda i: (0,)),
                pl.BlockSpec((3 * wa,), lambda i: (0,)),
                pl.BlockSpec((wa, w), lambda i: (0, 0)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((2,), lambda i: (0,)),
            ] + ([pl.BlockSpec((group, 1, s), lambda i: (i, 0, 0))]
                 if has_bias else []),
            out_specs=pl.BlockSpec((group, s, w), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
            interpret=interpret,
        )(x, ln_params["scale"].astype(jnp.float32),
          ln_params["bias"].astype(jnp.float32),
          qkv_wq["q"], qkv_wq["scale"].astype(jnp.float32),
          qkv_b.astype(jnp.float32),
          out_wq["q"], out_wq["scale"].astype(jnp.float32),
          out_b.astype(jnp.float32), a2,
          *([logit_bias.astype(jnp.float32)[:, None, :]]
            if has_bias else []))
    qkv = ln_qkv_int8(x, ln_params, qkv_wq, qkv_b, a_qkv, eps,
                      interpret=interpret)
    return attn_out_int8(qkv, x, out_wq, out_b, a_out, heads, head_dim,
                         scale, logit_bias=logit_bias, interpret=interpret)


# ------------------------------------------------ K123 (whole-layer kernel)
def _layer_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                  wout_ref, sout_ref, bout_ref, g2_ref, b2_ref,
                  w1_ref, s1_ref, bb1_ref, w2_ref, s2_ref, bb2_ref,
                  a_ref, o_ref, *, heads, head_dim, scale, eps):
    """One image, one FULL transformer layer per program: both sublayers'
    activations (QKV, attention output, the (S, 4W) MLP hidden) live and die
    in VMEM. HBM traffic per layer = read x + write out (2 x S x W)."""
    w = heads * head_dim

    def ln(z, g, b):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(z * z, -1, keepdims=True) - mu * mu, 0.0)
        return (z - mu) * jax.lax.rsqrt(var + eps) * g + b

    x32 = x_ref[0].astype(jnp.float32)                     # (S, W)
    aq, ao, a1, a2 = a_ref[0], a_ref[1], a_ref[2], a_ref[3]

    # ---- attention sublayer
    q8 = _quant_rows(ln(x32, g1_ref[...], b1_ref[...]), aq)
    acc = jax.lax.dot_general(q8, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * ((aq / 127.0) * sqkv_ref[...])
           + bqkv_ref[...]).astype(jnp.bfloat16)           # (S, 3W)
    outs = []
    for h in range(heads):
        lo = h * head_dim
        qh = qkv[:, lo:lo + head_dim]
        kh = qkv[:, w + lo:w + lo + head_dim]
        vh = qkv[:, 2 * w + lo:2 * w + lo + head_dim]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(vh.dtype), vh,
                            preferred_element_type=jnp.float32))
    o8 = _quant_rows(jnp.concatenate(outs, axis=-1), ao)
    acc2 = jax.lax.dot_general(o8, wout_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    x32 = x32 + acc2.astype(jnp.float32) * ((ao / 127.0) * sout_ref[...]) \
        + bout_ref[...]

    # ---- MLP sublayer
    q1 = _quant_rows(ln(x32, g2_ref[...], b2_ref[...]), a1)
    acc3 = jax.lax.dot_general(q1, w1_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h1 = acc3.astype(jnp.float32) * ((a1 / 127.0) * s1_ref[...]) \
        + bb1_ref[...]
    h1 = jax.nn.gelu(h1, approximate=True)
    q2 = _quant_rows(h1, a2)
    acc4 = jax.lax.dot_general(q2, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o = acc4.astype(jnp.float32) * ((a2 / 127.0) * s2_ref[...]) + bb2_ref[...]
    o_ref[0] = (x32 + o).astype(o_ref.dtype)


def siglip_layer_int8(x, bp, heads, head_dim, eps=1e-6, scale=None, *,
                      interpret=False):
    """(B, S, W) → (B, S, W): one static-quantized SigLIP layer as ONE
    Pallas kernel (see _layer_kernel). bp: the per-layer quantize_siglip
    slice incl. act_scales. Returns None if the geometry doesn't fit —
    caller falls back to the split kernels."""
    b, s, w = x.shape
    scale = scale if scale is not None else head_dim ** -0.5
    attn, mlp, sc = bp["attn"], bp["mlp"], bp["act_scales"]
    inter = mlp["fc1_w"]["q"].shape[-1]
    lane_ok = head_dim % 128 == 0 or 128 % head_dim == 0
    aligned = w % 128 == 0 and s % 8 == 0 and inter % 128 == 0
    # _layer_kernel slices QKV with w = heads*head_dim: head-padded
    # geometries (attention width Wa > model width W, qkv weight (W, 3*Wa))
    # must fall back to attn_sublayer_int8, which handles Wa != W.
    unpadded = (heads * head_dim == w
                and attn["qkv_w"]["q"].shape == (w, 3 * w)
                and attn["out_w"]["q"].shape == (w, w))
    weights = 4 * w * w + 2 * w * inter                    # int8 bytes
    acts = s * 3 * w * 2 + s * s * 4 + s * inter * 4 + 3 * s * w * 4
    fits = weights + acts <= 13 * 1024 * 1024
    if not ((_on_tpu() or interpret) and lane_ok and aligned and unpadded
            and fits):
        return None
    a4 = jnp.stack([jnp.asarray(sc[k], jnp.float32).reshape(())
                    for k in ("qkv", "out", "fc1", "fc2")])
    kernel = functools.partial(_layer_kernel, heads=heads,
                               head_dim=head_dim, scale=scale,
                               eps=float(eps))
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,))
    mat = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0)),
            vec(w), vec(w),
            mat(w, 3 * w), vec(3 * w), vec(3 * w),
            mat(w, w), vec(w), vec(w),
            vec(w), vec(w),
            mat(w, inter), vec(inter), vec(inter),
            mat(inter, w), vec(w), vec(w),
            vec(4),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        interpret=interpret,
    )(x, bp["ln1"]["scale"].astype(jnp.float32),
      bp["ln1"]["bias"].astype(jnp.float32),
      attn["qkv_w"]["q"], attn["qkv_w"]["scale"].astype(jnp.float32),
      attn["qkv_b"].astype(jnp.float32),
      attn["out_w"]["q"], attn["out_w"]["scale"].astype(jnp.float32),
      attn["out_b"].astype(jnp.float32),
      bp["ln2"]["scale"].astype(jnp.float32),
      bp["ln2"]["bias"].astype(jnp.float32),
      mlp["fc1_w"]["q"], mlp["fc1_w"]["scale"].astype(jnp.float32),
      mlp["fc1_b"].astype(jnp.float32),
      mlp["fc2_w"]["q"], mlp["fc2_w"]["scale"].astype(jnp.float32),
      mlp["fc2_b"].astype(jnp.float32), a4)


# ------------------------------------------------------------------ K2
def _attn_out_kernel(q_ref, k_ref, v_ref, x_ref, w_ref, s_ref, bias_ref,
                     a_ref, o_ref, *, heads, head_dim, scale):
    """One (batch, q-block) program: per-head full-softmax attention over
    fused-QKV column slices, then quant + int8 output projection + residual,
    all in VMEM."""
    w = heads * head_dim
    # python loop over heads (static, small): per-head full-softmax tiles,
    # concatenated in VMEM for the fused output projection
    outs = []
    for h in range(heads):
        lo = h * head_dim
        qh = q_ref[0, :, lo:lo + head_dim]
        kh = k_ref[0, :, lo:lo + head_dim]
        vh = v_ref[0, :, lo:lo + head_dim]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(vh.dtype), vh,
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1)               # (qb, W) f32

    a = a_ref[0]
    q8 = _quant_rows(o, a)
    acc = jax.lax.dot_general(q8, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    proj = acc.astype(jnp.float32) * ((a / 127.0) * s_ref[...]) + bias_ref[...]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + proj).astype(o_ref.dtype)


def _attn_out_reference(qkv, x, wq, ws, bias, a, heads, head_dim, scale,
                        logit_bias=None):
    """Fallback when the fused kernel exceeds VMEM (so400m padded S=1024):
    the attention itself still goes through ops/attention.attention_qkv
    (Pallas on TPU with its own head-group tiling; XLA einsum elsewhere) —
    only the quant + int8 out-proj + residual run as plain XLA.

    TPUDF_INT8_ATTN=1 additionally runs QK^T/AV as dynamic-int8 MXU
    matmuls (ops/attention.py) — the long-sequence geometries that land
    here are exactly where attention is 30-50% of the int8 tower's time."""
    import os
    from tpudf.ops.attention import attention_qkv
    o = attention_qkv(qkv, heads, head_dim, scale, logit_bias=logit_bias,
                      int8_attn=os.environ.get("TPUDF_INT8_ATTN") == "1"
                      )                                  # (B, S, Wa)
    a = jnp.asarray(a, jnp.float32)
    q8 = _quant_rows(o.astype(jnp.float32), a)
    acc = jax.lax.dot_general(q8, wq, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    proj = acc.astype(jnp.float32) * ((a / 127.0) * ws) + bias
    return (x.astype(jnp.float32) + proj).astype(x.dtype)


def attn_out_int8(qkv, x, wq_dict, bias, act_scale, heads, head_dim,
                  scale=None, *, q_block=256, logit_bias=None,
                  interpret=False):
    """(B, S, 3W) + residual (B, S, W) → (B, S, W).

    Fused-QKV attention with the int8 output projection and residual add in
    the kernel epilogue — the per-head attention output never round-trips
    through HBM. Requires lane-aligned head_dim (64/128; so400m's 72 → XLA
    twin) and S small enough for full-softmax VMEM residency."""
    b, s, w3 = qkv.shape
    wa = w3 // 3                     # attention width (head-padded allowed)
    wm = x.shape[-1]                 # model width
    scale = scale if scale is not None else head_dim ** -0.5
    wq, ws = wq_dict["q"], wq_dict["scale"]
    args_ref = (wq, ws.astype(jnp.float32), bias.astype(jnp.float32))
    a = jnp.asarray(act_scale, jnp.float32).reshape(1)
    lane_ok = head_dim % 128 == 0 or 128 % head_dim == 0
    aligned = wa % 128 == 0 and wm % 128 == 0
    # VMEM bound incl. Mosaic double-buffering of the input blocks (2x the
    # q/K/V/x tiles) + weight + f32 score and o tiles — the padded so400m
    # geometry (S=1024, Wa=2048) measured 19 MB against the old estimate's
    # 9.4 and OOMed the 16 MB scoped limit
    qb0 = min(q_block, s)
    fits = (2 * (qb0 * wa * 2 + 2 * s * wa * 2 + qb0 * wm * 2)
            + wa * wm + qb0 * s * 4 + qb0 * wa * 4) <= 13 * 1024 * 1024
    if not ((_on_tpu() or interpret) and lane_ok and aligned and fits
            and s % 8 == 0) or logit_bias is not None:
        return _attn_out_reference(qkv, x, *args_ref, a, heads, head_dim,
                                   scale, logit_bias)
    qb = min(q_block, s)
    sp = ((s + qb - 1) // qb) * qb
    qkv_p = jnp.pad(qkv, ((0, 0), (0, sp - s), (0, 0))) if sp != s else qkv
    x_p = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))) if sp != s else x

    kernel = functools.partial(_attn_out_kernel, heads=heads,
                               head_dim=head_dim, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, sp // qb),
        in_specs=[
            pl.BlockSpec((1, qb, wa), lambda i, j: (i, j, 0)),      # q rows
            pl.BlockSpec((1, s, wa), lambda i, j: (i, 0, 1)),       # full K
            pl.BlockSpec((1, s, wa), lambda i, j: (i, 0, 2)),       # full V
            pl.BlockSpec((1, qb, wm), lambda i, j: (i, j, 0)),      # residual
            pl.BlockSpec((wa, wm), lambda i, j: (0, 0)),
            pl.BlockSpec((wm,), lambda i, j: (0,)),
            pl.BlockSpec((wm,), lambda i, j: (0,)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, qb, wm), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, wm), x.dtype),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, x_p, *args_ref, a)
    return out[:, :s] if sp != s else out
