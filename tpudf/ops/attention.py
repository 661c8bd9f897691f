"""Fused multi-head attention for SigLIP ViTs.

The reference gets its attention speed from CUDA Flash/mem-efficient SDPA
(cifake_binary_classifier.py:24-27, hidf_video_classifier.py:69-72,
siglip2siddataset.py:35-37). The TPU-native equivalent is a Pallas kernel.

Design notes (TPU-first, not a flash-attention translation):
  * SigLIP attention is non-causal, unmasked, with short sequences —
    (image_size/16)^2 tokens: 256 @256px, 576 @384px, 1024 @512px.
  * At these lengths the ENTIRE K/V for one (batch, head) fits comfortably in
    VMEM (1024 x 128 x bf16 = 256 KiB), so we do NOT need the online-softmax
    streaming of flash attention. The kernel keeps K/V resident, computes the
    full (q_block, seq) score tile in f32 on the MXU, applies one exact
    softmax, and multiplies back — one pass, no rescaling loop, better MXU
    utilisation than a streamed kernel at this scale.
  * Grid = (batch*heads, q_blocks). Padding tokens (to reach a multiple of the
    q block / lane alignment) are masked with -inf before the softmax.

Falls back to a pure-XLA einsum implementation off-TPU (CPU tests) and for
shapes the kernel does not support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-enabled builds; guard for portability
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def attention_reference(q, k, v, scale=None):
    """Plain XLA attention. q,k,v: (B, H, S, D). Returns (B, H, S, D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
    """One (batch*head, q_block) program: full-softmax attention tile."""
    q = q_ref[0]                      # (Bq, D)
    k = k_ref[0]                      # (Skv, D)
    v = v_ref[0]                      # (Skv, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (Bq, Skv)
    skv = k.shape[0]
    if skv > seq_len:  # mask KV padding
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_ids < seq_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas(q, k, v, scale, *, q_block=256, interpret=False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, 128)         # lane-aligned query length
    q_block = min(q_block, sq_p)
    sq_p = _round_up(sq_p, q_block)
    skv_p = _round_up(skv, 128)
    # head_dim stays un-padded: mosaic handles sub-128 minor dims internally,
    # and materializing a 2x padded copy (64→128) costs real HBM traffic.
    dp = d

    def pad(x, target_s):
        s = x.shape[2]
        return jnp.pad(x, ((0, 0), (0, 0), (0, target_s - s), (0, dp - d)))

    qp = pad(q, sq_p).reshape(b * h, sq_p, dp)
    kp = pad(k, skv_p).reshape(b * h, skv_p, dp)
    vp = pad(v, skv_p).reshape(b * h, skv_p, dp)

    grid = (b * h, sq_p // q_block)
    kernel = functools.partial(_attn_kernel, scale=scale, seq_len=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, dp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_block, dp), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, sq_p, dp)[:, :, :sq, :d]


def _attention_pallas_bshd(q, k, v, scale, *, q_block=256, interpret=False):
    """Layout-native kernel: q,k,v in (B, S, H, D) — the natural layout after
    slicing a fused QKV projection. Avoids the (B,H,S,D) transpose copies
    (~300 MB/layer at inference batch sizes) entirely: the grid iterates
    (batch, head, q-block) and BlockSpecs gather strided (S, D) tiles per
    head directly from HBM."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sq_p = _round_up(sq, 128)
    q_block = min(q_block, sq_p)
    sq_p = _round_up(sq_p, q_block)
    skv_p = _round_up(skv, 128)

    def pad(x, target_s):
        s = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, target_s - s), (0, 0), (0, 0)))

    # keep the f32 score tile (h, q_block, skv_p) within ~6 MiB of VMEM
    while h * q_block * skv_p * 4 > 6 * 1024 * 1024 and q_block > 64:
        q_block //= 2
    sq_p = _round_up(max(sq_p, q_block), q_block)

    qp, kp, vp = pad(q, sq_p), pad(k, skv_p), pad(v, skv_p)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        # head-major in-VMEM views (swap of major dims — no lane relayout);
        # mosaic requires dot_general batch dims at position 0
        qt = jnp.swapaxes(q_ref[0], 0, 1)   # (H, qb, D)
        kt = jnp.swapaxes(k_ref[0], 0, 1)   # (H, Skv, D)
        vt = jnp.swapaxes(v_ref[0], 0, 1)
        s = jax.lax.dot_general(            # (H, qb, Skv), batched over H
            qt, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if skv_p > skv:
            kv_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(kv_ids < skv, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(            # (H, qb, D)
            p.astype(vt.dtype), vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, sq_p // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, h, d), lambda i, n: (i, n, 0, 0)),
            pl.BlockSpec((1, skv_p, h, d), lambda i, n: (i, 0, 0, 0)),
            pl.BlockSpec((1, skv_p, h, d), lambda i, n: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_block, h, d), lambda i, n: (i, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq]


def _attention_qkv_pallas(qkv, heads, head_dim, scale, *, q_block=256,
                          interpret=False, int8_attn=False):
    """Transpose-free attention over a fused QKV activation.

    qkv: (B, S, 3W) — the raw output of the fused QKV projection, laid out
    [q | k | v] with heads contiguous inside each W span. Returns (B, S, W)
    ready for the output projection. No (B,H,S,D) reshape/transpose copies
    ever materialize in HBM — the kernel slices per-head columns in VMEM.
    Measured: removes ~45% of ViT forward time at inference batch sizes.

    int8_attn: run QK^T and AV as dynamically-quantized int8 MXU matmuls
    (per-head per-tile amax computed in VMEM — no calibration needed; probs
    are quantized with the exact scale 1/127 since softmax output is in
    [0,1]). 2x MXU rate on the score/AV matmuls — worthwhile for the
    long-sequence geometries (S>=576) where attention is ~30-50% of the
    static-int8 tower's time. Inference-only accuracy knob; end effect
    bounded by the engine cosine/AUC tests.
    """
    b, s, w3 = qkv.shape
    w = w3 // 3
    qb = min(q_block, s)
    # pad the q axis up to a q_block multiple (padded rows attend over the
    # real KV and are sliced off afterwards) — keeps MXU tiles large at
    # non-dividing sequence lengths (e.g. S=576)
    sp = _round_up(s, qb)
    qkv_q = jnp.pad(qkv, ((0, 0), (0, sp - s), (0, 0))) if sp != s else qkv

    # head-group tiling: shrink the K/V blocks (which the pipeline double-
    # buffers) until they fit VMEM alongside q/out/score buffers. Each grid
    # step handles `heads // ngroups` heads over a (S, W/ngroups) column span.
    ngroups = 1
    cand = 1
    while cand <= heads:
        valid = heads % cand == 0 and w % cand == 0 \
            and (w // cand) % 128 == 0
        if valid:
            ngroups = cand
            if s * (w // cand) * 2 * 4 <= 8 * 1024 * 1024:
                break
        cand *= 2
    gw = w // ngroups
    gheads = heads // ngroups

    def _one_head(qh, kh, vh):
        if int8_attn:
            q32 = qh.astype(jnp.float32)
            k32 = kh.astype(jnp.float32)
            aq = jnp.max(jnp.abs(q32)) + 1e-6
            ak = jnp.max(jnp.abs(k32)) + 1e-6
            q8 = jnp.clip(jnp.round(q32 * (127.0 / aq)),
                          -127, 127).astype(jnp.int8)
            k8 = jnp.clip(jnp.round(k32 * (127.0 / ak)),
                          -127, 127).astype(jnp.int8)
            sc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ((aq * ak) / (127.0 * 127.0) * scale)
        else:
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if int8_attn:
            v32 = vh.astype(jnp.float32)
            av = jnp.max(jnp.abs(v32)) + 1e-6
            # per-ROW amax for the probs: near-uniform attention rows have
            # p ~ 1/S, so a fixed 1/127 scale would quantize them to ~50%
            # relative error; row-wise scaling keeps the step at p_max/254
            ap = jnp.max(p, axis=-1, keepdims=True) + 1e-20
            p8 = jnp.round(p * (127.0 / ap)).astype(jnp.int8)
            v8 = jnp.clip(jnp.round(v32 * (127.0 / av)),
                          -127, 127).astype(jnp.int8)
            return jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (ap * (av / (127.0 * 127.0)))
        return jnp.dot(p.astype(vh.dtype), vh,
                       preferred_element_type=jnp.float32)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        if head_dim % 128 == 0:
            # lane-aligned dynamic ref slicing + fori_loop: one live score
            # buffer instead of `heads` unrolled ones (VMEM stack)
            def body(h, _):
                lo = pl.multiple_of(h * head_dim, 128)
                qh = q_ref[0, :, pl.ds(lo, head_dim)]
                kh = k_ref[0, :, pl.ds(lo, head_dim)]
                vh = v_ref[0, :, pl.ds(lo, head_dim)]
                o_ref[0, :, pl.ds(lo, head_dim)] = \
                    _one_head(qh, kh, vh).astype(o_ref.dtype)
                return 0
            jax.lax.fori_loop(0, gheads, body, 0)
        else:
            qt = q_ref[0]                    # (qb, GW)
            kt = k_ref[0]                    # (S, GW)
            vt = v_ref[0]
            for h in range(gheads):
                lo = h * head_dim
                o_ref[0, :, lo:lo + head_dim] = _one_head(
                    qt[:, lo:lo + head_dim], kt[:, lo:lo + head_dim],
                    vt[:, lo:lo + head_dim]).astype(o_ref.dtype)

    # q/k/v as separate column-block views of the same array (3x less VMEM
    # than holding the fused 3W row); with head-group tiling each block is
    # (S, W/ngroups) at block columns [g], [ngroups + g], [2*ngroups + g]
    out = pl.pallas_call(
        kernel,
        grid=(b, sp // qb, ngroups),
        in_specs=[
            pl.BlockSpec((1, qb, gw), lambda i, j, g: (i, j, g)),
            pl.BlockSpec((1, s, gw), lambda i, j, g: (i, 0, ngroups + g)),
            pl.BlockSpec((1, s, gw), lambda i, j, g: (i, 0, 2 * ngroups + g)),
        ],
        out_specs=pl.BlockSpec((1, qb, gw), lambda i, j, g: (i, j, g)),
        out_shape=jax.ShapeDtypeStruct((b, sp, w), qkv.dtype),
        interpret=interpret,
    )(qkv_q, qkv, qkv)
    return out[:, :s] if sp != s else out


def _reference_qkv(qkv, heads, head_dim, scale, logit_bias=None):
    b, s, w3 = qkv.shape
    w = w3 // 3
    q = qkv[..., :w].reshape(b, s, heads, head_dim)
    k = qkv[..., w:2 * w].reshape(b, s, heads, head_dim)
    v = qkv[..., 2 * w:].reshape(b, s, heads, head_dim)
    if logit_bias is None:
        o = _reference_bshd(q, k, v, scale)
    else:
        # per-key additive logit bias (ToMe proportional attention:
        # logits += log token_size, ops/tome.py)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + logit_bias[:, None, None, :].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return o.reshape(b, s, w)


def _attn_qkv_bwd_kernel(qkv_ref, g_ref, d_ref, *, heads, head_dim, scale):
    """Fused-QKV attention backward, one image per program.

    Standard full-softmax gradients (no streaming needed at SigLIP sequence
    lengths — the (S, S) probability tile lives in VMEM):
      P  = softmax(q k^T * scale)
      dV = P^T g;  dP = g V^T;  dS = P * (dP - rowsum(dP * P)) * scale
      dQ = dS K;   dK = dS^T Q
    Writes the (S, 3W) dqkv laid out exactly like the forward input.
    """
    w = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[0, :, lo:lo + head_dim]
        k = qkv_ref[0, :, w + lo:w + lo + head_dim]
        v = qkv_ref[0, :, 2 * w + lo:2 * w + lo + head_dim]
        gh = g_ref[0, :, lo:lo + head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)           # (S, S) f32
        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(pb, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsb = ds.astype(q.dtype)
        dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d_ref[0, :, lo:lo + head_dim] = dq.astype(d_ref.dtype)
        d_ref[0, :, w + lo:w + lo + head_dim] = dk.astype(d_ref.dtype)
        d_ref[0, :, 2 * w + lo:2 * w + lo + head_dim] = dv.astype(d_ref.dtype)


def _attention_qkv_bwd_pallas(qkv, g, heads, head_dim, scale, *,
                              interpret=False):
    b, s, w3 = qkv.shape
    w = w3 // 3
    kernel = functools.partial(_attn_qkv_bwd_kernel, heads=heads,
                               head_dim=head_dim, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, w3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w3), qkv.dtype),
        interpret=interpret,
    )(qkv, g)


@functools.lru_cache(maxsize=None)
def _fused_qkv_with_vjp(heads: int, head_dim: int, scale: float,
                        interpret: bool):
    @jax.custom_vjp
    def f(qkv):
        return _attention_qkv_pallas(qkv, heads, head_dim, scale,
                                     interpret=interpret)

    def fwd(qkv):
        return f(qkv), (qkv,)

    def bwd(res, g):
        (qkv,) = res
        b, s, w3 = qkv.shape
        w = w3 // 3
        # Pallas bwd kernel when the (S,S) f32 tile + qkv rows fit VMEM and
        # lanes align; XLA-recompute VJP otherwise (so400m head_dim=72,
        # very long sequences). TPUDF_PALLAS_ATTN_BWD=0 forces the XLA
        # path — the A/B used by scripts/bench_train.py main_attn_bwd to
        # keep the deploy-by-measurement record honest (read at trace
        # time, so set it before the train step is built).
        import os as _os
        enabled = _os.environ.get("TPUDF_PALLAS_ATTN_BWD", "1") != "0"
        fits = s * s * 4 + 2 * s * w3 * 2 + s * w * 2 <= 12 * 1024 * 1024
        lane_ok = head_dim % 128 == 0 or 128 % head_dim == 0
        if enabled and fits and lane_ok and s % 8 == 0 and w % 128 == 0:
            return (_attention_qkv_bwd_pallas(
                qkv, g, heads, head_dim, scale, interpret=interpret),)
        _, vjp = jax.vjp(
            lambda t: _reference_qkv(t, heads, head_dim, scale), qkv)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def attention_qkv(qkv, heads, head_dim, scale=None, *, use_pallas=None,
                  interpret=False, logit_bias=None, int8_attn=False):
    """Fused-QKV attention: (B, S, 3W) → (B, S, W).

    The kernel slices per-head columns in VMEM, which Mosaic only supports
    at lane-aligned offsets — head_dim must divide into (or be a multiple
    of) the 128-lane tile (64 ✓, 128 ✓; so400m's 72 ✗ → XLA fallback).

    logit_bias: optional (B, S) per-key additive logit bias (ToMe
    proportional attention) — routed through the XLA path (the inference
    hot path carries it inside the fused int8 kernels instead).

    int8_attn: dynamically-quantized int8 QK^T/AV inside the kernel
    (inference-only — no VJP; see _attention_qkv_pallas). Requested by the
    static-int8 tower for long-sequence geometries via TPUDF_INT8_ATTN=1."""
    scale = scale if scale is not None else head_dim ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu()
    # mosaic block constraint: the per-group column span (W/ngroups) must be
    # a multiple of the 128-lane tile — widths below 128 (test configs)
    # can never satisfy it, so they take the XLA path
    lane_ok = ((head_dim % 128 == 0) or (128 % head_dim == 0)) \
        and (qkv.shape[-1] // 3) % 128 == 0
    if (use_pallas or interpret) and lane_ok and logit_bias is None:
        if int8_attn:
            return _attention_qkv_pallas(qkv, int(heads), int(head_dim),
                                         float(scale), interpret=interpret,
                                         int8_attn=True)
        return _fused_qkv_with_vjp(int(heads), int(head_dim), float(scale),
                                   bool(interpret))(qkv)
    return _reference_qkv(qkv, heads, head_dim, scale, logit_bias)


def _reference_bshd(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@functools.lru_cache(maxsize=None)
def _fused_bshd_with_vjp(scale: float, interpret: bool):
    @jax.custom_vjp
    def f(q, k, v):
        return _attention_pallas_bshd(q, k, v, scale, interpret=interpret)

    def fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(lambda q, k, v: _reference_bshd(q, k, v, scale),
                         q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def attention_bshd(q, k, v, scale=None, *, use_pallas=None, interpret=False):
    """Multi-head attention in (B, S, H, D) layout → (B, S, H, D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas or interpret:
        return _fused_bshd_with_vjp(float(scale), bool(interpret))(q, k, v)
    return _reference_bshd(q, k, v, scale)


@functools.lru_cache(maxsize=None)
def _fused_with_vjp(scale: float, interpret: bool):
    """Pallas forward + XLA-recompute backward.

    pallas_call has no autodiff rule; the backward pass recomputes attention
    through the XLA reference path (cheap at SigLIP sequence lengths, and only
    exercised when the backbone is unfrozen, e.g. MTL fine-tuning of the top
    blocks — ref Siglip2sidafrozen.py:754-770)."""

    @jax.custom_vjp
    def f(q, k, v):
        return _attention_pallas(q, k, v, scale, interpret=interpret)

    def fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(
            lambda q, k, v: attention_reference(q, k, v, scale), q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _on_tpu():
    from tpudf.core.backend import on_tpu
    return on_tpu()


def attention(q, k, v, scale=None, *, use_pallas=None, interpret=False):
    """Multi-head attention dispatch. q,k,v: (B, H, S, D) → (B, H, S, D).

    Uses the Pallas fused kernel on TPU (or when `interpret=True` for tests),
    otherwise the XLA reference path.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu()
    if (use_pallas or interpret) and q.shape[2] <= 4096:
        return _fused_with_vjp(float(scale), bool(interpret))(q, k, v)
    return attention_reference(q, k, v, scale)
