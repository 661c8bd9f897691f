"""Pallas fused layer norm for TPU.

XLA lowers the naive LN (cast→mean→var→normalize) at ~100 GB/s effective on
v5e — an 8x gap to HBM speed-of-light, and LN is ~30% of ViT forward time at
inference batch sizes. This kernel reads each activation row once, computes
f32 moments in VMEM, and writes the normalized bf16 row once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)          # (rows, W)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    m2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)


def _ln_pallas(x2d, scale, bias, eps, *, block_rows=256, interpret=False):
    n, w = x2d.shape
    rows = min(block_rows, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=((n + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out[:n] if pad else out


@functools.lru_cache(maxsize=None)
def _fused_ln(eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x2d, scale, bias):
        return _ln_pallas(x2d, scale, bias, eps, interpret=interpret)

    def ref(x2d, scale, bias):
        x32 = x2d.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x2d.dtype)

    def fwd(x2d, scale, bias):
        return f(x2d, scale, bias), (x2d, scale, bias)

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _ln_quant_kernel(x_ref, s_ref, b_ref, q_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    m2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * s_ref[...] + b_ref[...]
    inv = 127.0 / q_ref[0]
    o_ref[...] = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)


def layer_norm_quant(x, scale, bias, act_scale, eps=1e-6, *,
                     block_rows=256, interpret=False):
    """Fused LN emitting a symmetric-int8 row directly (one bf16 read, one
    int8 write) — feeds ops/quant.int8_matmul_pre on the W8A8 path. The
    separate LN→quantize chain would round-trip the bf16 LN output through
    HBM; fusing the emission halves the quant path's activation traffic."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    lead = x.shape[:-1]
    w = x.shape[-1]
    act = jnp.asarray(act_scale, jnp.float32).reshape(1)
    if not (on_tpu or interpret) or w % 128 != 0:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias
        q = jnp.clip(jnp.round(y * (127.0 / act[0])), -127, 127)
        return q.astype(jnp.int8).reshape(*lead, w)
    x2d = x.reshape(-1, w)
    n = x2d.shape[0]
    rows = min(block_rows, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=float(eps)),
        grid=((n + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int8),
        interpret=interpret,
    )(x2d, scale.astype(jnp.float32), bias.astype(jnp.float32), act)
    out = out[:n] if pad else out
    return out.reshape(*lead, w)


def layer_norm_fused(x, scale, bias, eps=1e-6, *, interpret=False):
    """(..., W) fused LN; falls back to XLA off-TPU."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    lead = x.shape[:-1]
    w = x.shape[-1]
    if not (on_tpu or interpret):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)
    out = _fused_ln(float(eps), bool(interpret))(
        x.reshape(-1, w), scale, bias)
    return out.reshape(*lead, w)
