"""Fused transformer-MLP Pallas kernel: x + fc2(gelu(fc1(LN(x)))).

The ViT MLP sublayer is HBM-bound around the matmuls: the naive graph
writes/reads the (M, 4W) hidden activation and the LN output
(~1.4 GB/layer at inference batch sizes). Both weight matrices of a
SigLIP-base layer fit in VMEM (2 x 4.7 MiB bf16), so this kernel keeps them
resident, streams x row-tiles, and performs LN → fc1 → gelu(tanh) → fc2 →
residual entirely on-chip: HBM traffic drops to read x + write out
(~200 MB/layer), worth ~15% of end-to-end forward time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            eps):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[...]
         + b_ref[...]).astype(x.dtype)
    h1 = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) \
        + b1_ref[...]
    h1 = jax.nn.gelu(h1, approximate=True).astype(x.dtype)
    h2 = jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32) \
        + b2_ref[...]
    o_ref[...] = (x32 + h2).astype(o_ref.dtype)


def _mlp_block_pallas(x2d, ln_scale, ln_bias, w1, b1, w2, b2, eps,
                      *, block_rows=256, interpret=False):
    n, w = x2d.shape
    rows = min(block_rows, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=((n + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((w1.shape[1],), lambda i: (0,)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))
    return out[:n] if pad else out


def _reference(x2d, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    x32 = x2d.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
         ).astype(x2d.dtype)
    h1 = jax.nn.gelu(h @ w1 + b1, approximate=True)
    return (x32 + (h1 @ w2 + b2)).astype(x2d.dtype)


@functools.lru_cache(maxsize=None)
def _fused(eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x2d, g, b, w1, b1, w2, b2):
        return _mlp_block_pallas(x2d, g, b, w1, b1, w2, b2, eps,
                                 interpret=interpret)

    def fwd(x2d, g, b, w1, b1, w2, b2):
        return f(x2d, g, b, w1, b1, w2, b2), (x2d, g, b, w1, b1, w2, b2)

    def bwd(res, grad):
        _, vjp = jax.vjp(lambda *a: _reference(*a, eps), *res)
        return vjp(grad)

    f.defvjp(fwd, bwd)
    return f


def _kernel_int8(x_ref, g_ref, b_ref, w1_ref, s1w_ref, b1_ref, w2_ref,
                 s2w_ref, b2_ref, a1_ref, a2_ref, o_ref, *, eps):
    """W8A8 MLP sublayer, single pass: LN → quant → int8 fc1 (MXU) → gelu →
    quant → int8 fc2 → residual. The (rows, 4W) hidden never leaves VMEM and
    the two int8 weight mats (4x smaller than bf16) stay resident — HBM
    traffic is read x + write out, with both matmuls at the 2x int8 rate."""
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[...] + b_ref[...]
    a1 = a1_ref[0]
    q1 = jnp.clip(jnp.round(y * (127.0 / a1)), -127, 127).astype(jnp.int8)
    acc1 = jax.lax.dot_general(q1, w1_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * ((a1 / 127.0) * s1w_ref[...]) + b1_ref[...]
    h = jax.nn.gelu(h, approximate=True)
    a2 = a2_ref[0]
    q2 = jnp.clip(jnp.round(h * (127.0 / a2)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(q2, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o = acc2.astype(jnp.float32) * ((a2 / 127.0) * s2w_ref[...]) + b2_ref[...]
    o_ref[...] = (x32 + o).astype(o_ref.dtype)


def _kernel_int8_ss(x_ref, g_ref, b_ref, w1_ref, s1w_ref, b1_ref, w2_ref,
                    s2w_ref, b2_ref, a1_ref, a2_ref, o_ref, ss_ref, *, eps):
    """_kernel_int8 + per-row sum-of-squares epilogue: the ToMe merge that
    follows this sublayer needs row norms of the block output for its
    cosine similarity (ops/tome.merge_step) — emitting them here while the
    output tile is still in VMEM saves the merge's separate full-tensor
    read. Computed from the bf16-CAST output (what the merge would read
    back), so the value matches the external computation."""
    _kernel_int8(x_ref, g_ref, b_ref, w1_ref, s1w_ref, b1_ref, w2_ref,
                 s2w_ref, b2_ref, a1_ref, a2_ref, o_ref, eps=eps)
    ob = o_ref[...].astype(jnp.float32)
    ss = jnp.sum(ob * ob, axis=-1, keepdims=True)
    ss_ref[...] = jnp.broadcast_to(ss, ss_ref.shape)


def _mlp_block_pallas_int8(x2d, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s,
                           b2, a1, a2, eps, *, block_rows=512,
                           interpret=False, emit_sumsq=False):
    n, w = x2d.shape
    inter = w1q.shape[1]
    rows = min(block_rows, n)
    # keep the per-program working set (int8 weights + f32 hidden + row
    # tiles) under the scoped-VMEM limit for wide geometries (so400m's
    # padded inter=4352) — same adaptive shrink as ops/int8_block.ln_qkv
    # threshold calibrated on the v5e: large-384 (w=1024, inter=4096,
    # est 21 MB) runs at 512 rows; the padded so400m (w=1152, inter=4352,
    # est 23.6 MB) must shrink
    while rows > 128 and (2 * w * inter + rows * inter * 4
                          + 4 * rows * w * 2) > 22 * 1024 * 1024:
        rows //= 2
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    if emit_sumsq:
        out_specs = [pl.BlockSpec((rows, w), lambda i: (i, 0)),
                     pl.BlockSpec((rows, 128), lambda i: (i, 0))]
        out_shape = [jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
                     jax.ShapeDtypeStruct((n + pad, 128), jnp.float32)]
        kernel = functools.partial(_kernel_int8_ss, eps=eps)
    else:
        out_specs = pl.BlockSpec((rows, w), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct(x2d.shape, x2d.dtype)
        kernel = functools.partial(_kernel_int8, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=((n + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w, inter), lambda i: (0, 0)),
            pl.BlockSpec((inter,), lambda i: (0,)),
            pl.BlockSpec((inter,), lambda i: (0,)),
            pl.BlockSpec((inter, w), lambda i: (0, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x2d, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      w1q, w1s.astype(jnp.float32), b1.astype(jnp.float32),
      w2q, w2s.astype(jnp.float32), b2.astype(jnp.float32),
      jnp.asarray(a1, jnp.float32).reshape(1),
      jnp.asarray(a2, jnp.float32).reshape(1))
    if emit_sumsq:
        o, ss = out
        return (o[:n] if pad else o), ss[:n, 0]
    return out[:n] if pad else out


def _reference_int8(x2d, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s, b2,
                    a1, a2, eps):
    """XLA twin of the int8 kernel (exact same quantization math)."""
    x32 = x2d.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    a1 = jnp.asarray(a1, jnp.float32)
    q1 = jnp.clip(jnp.round(y * (127.0 / a1)), -127, 127).astype(jnp.int8)
    acc1 = jax.lax.dot_general(q1, w1q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * ((a1 / 127.0) * w1s) + b1
    h = jax.nn.gelu(h, approximate=True)
    a2 = jnp.asarray(a2, jnp.float32)
    q2 = jnp.clip(jnp.round(h * (127.0 / a2)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(q2, w2q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o = acc2.astype(jnp.float32) * ((a2 / 127.0) * w2s) + b2
    return (x32 + o).astype(x2d.dtype)


def mlp_block_fused_int8(x, ln_params, mlp_q, act_scales, eps=1e-6, *,
                         interpret=False, emit_sumsq=False):
    """W8A8 MLP sublayer: (B, S, W) → (B, S, W).

    mlp_q: quantize_siglip per-layer slice ({fc1_w: {q, scale}, ...});
    act_scales: {"fc1": scalar, "fc2": scalar} static activation scales from
    ops/quant.calibrate_siglip_act_scales. Inference-only (no vjp).

    emit_sumsq=True additionally returns (B, S) per-row sum-of-squares of
    the output — the row norms the following ToMe merge needs — computed
    in the Pallas kernel's epilogue while the tile is in VMEM (saves the
    merge's separate full-tensor read on TPU; the fallback computes the
    identical value externally)."""
    w = x.shape[-1]
    inter = mlp_q["fc1_w"]["q"].shape[-1]
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    args = (ln_params["scale"], ln_params["bias"],
            mlp_q["fc1_w"]["q"], mlp_q["fc1_w"]["scale"], mlp_q["fc1_b"],
            mlp_q["fc2_w"]["q"], mlp_q["fc2_w"]["scale"], mlp_q["fc2_b"],
            act_scales["fc1"], act_scales["fc2"])
    aligned = w % 128 == 0 and inter % 128 == 0
    fits = w * inter * 2 <= 10 * 1024 * 1024          # both mats, int8
    if (on_tpu or interpret) and aligned and fits:
        out = _mlp_block_pallas_int8(
            x.reshape(-1, w), *args, float(eps),
            interpret=interpret, emit_sumsq=emit_sumsq)
        if emit_sumsq:
            o, ss = out
            return o.reshape(x.shape), ss.reshape(x.shape[:-1])
        return out.reshape(x.shape)
    out = _reference_int8(x.reshape(-1, w), *args, float(eps)
                          ).reshape(x.shape)
    if emit_sumsq:
        o32 = out.astype(jnp.float32)
        return out, jnp.sum(o32 * o32, axis=-1)
    return out


def mlp_block_fused(x, ln_params, mlp_params, eps=1e-6, *, interpret=False):
    """(B, S, W) → (B, S, W): residual + MLP sublayer with fused LN.

    Dispatches to the Pallas kernel on TPU when both weight matrices fit a
    conservative VMEM budget; XLA reference otherwise."""
    w = x.shape[-1]
    inter = mlp_params["fc1_w"].shape[-1]
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    fits = (w * inter * 2 * 2) <= 10 * 1024 * 1024   # both mats, bf16
    args = (ln_params["scale"], ln_params["bias"],
            mlp_params["fc1_w"], mlp_params["fc1_b"],
            mlp_params["fc2_w"], mlp_params["fc2_b"])
    aligned = w % 128 == 0 and inter % 128 == 0
    if (on_tpu or interpret) and x.dtype == jnp.bfloat16 and aligned:
        if fits:
            out2d = _fused(float(eps), bool(interpret))(
                x.reshape(-1, w), *args)
            return out2d.reshape(x.shape)
        if w * inter * 2 <= 9 * 1024 * 1024:
            # one matrix at a time still fits: two fused halves
            # (LN+fc1+gelu, then fc2+residual) — large-384 geometry
            from tpudf.ops.linear import linear_fused
            h = linear_fused(x, mlp_params["fc1_w"], mlp_params["fc1_b"],
                             ln=(ln_params["scale"], ln_params["bias"]),
                             activation="gelu", eps=eps, interpret=interpret)
            return linear_fused(h, mlp_params["fc2_w"],
                                mlp_params["fc2_b"], residual=x,
                                interpret=interpret)
    return _reference(x.reshape(-1, w), *args, eps).reshape(x.shape)
