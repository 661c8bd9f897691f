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
