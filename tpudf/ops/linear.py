"""Fused LN→matmul(→+residual) Pallas kernel.

Companion to ops/mlp.py for the attention sublayer's projections: keeps the
weight matrix VMEM-resident, streams activation row-tiles, and optionally
applies the pre-LN on the way in and the residual add on the way out — so
the LN output and projection output never round-trip HBM.

  y = (LN(x) if ln else x) @ W + b   [+ residual]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(eps, with_ln, with_res, activation):
    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        if with_ln:
            g_ref = refs[i]; b_ref = refs[i + 1]; i += 2
        w_ref = refs[i]; bias_ref = refs[i + 1]; i += 2
        if with_res:
            r_ref = refs[i]; i += 1
        o_ref = refs[i]

        x = x_ref[...]
        if with_ln:
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, -1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0.0)
            x = ((x32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[...]
                 + b_ref[...]).astype(x.dtype)
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32) \
            + bias_ref[...]
        if activation == "gelu":
            y = jax.nn.gelu(y, approximate=True)
        if with_res:
            y = y + r_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)
    return kernel


def _fused_linear_pallas(x2d, w, bias, ln, res, eps, *, block_rows=256,
                         activation=None, interpret=False):
    n, din = x2d.shape
    dout = w.shape[1]
    rows = min(block_rows, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        if res is not None:
            res = jnp.pad(res, ((0, pad), (0, 0)))
    inputs = [x2d]
    in_specs = [pl.BlockSpec((rows, din), lambda i: (i, 0))]
    if ln is not None:
        inputs += [ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)]
        in_specs += [pl.BlockSpec((din,), lambda i: (0,)),
                     pl.BlockSpec((din,), lambda i: (0,))]
    inputs += [w, bias.astype(jnp.float32)]
    in_specs += [pl.BlockSpec(w.shape, lambda i: (0, 0)),
                 pl.BlockSpec((dout,), lambda i: (0,))]
    if res is not None:
        inputs.append(res)
        in_specs.append(pl.BlockSpec((rows, dout), lambda i: (i, 0)))
    out = pl.pallas_call(
        _make_kernel(eps, ln is not None, res is not None, activation),
        grid=((n + pad) // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, dout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad, dout), x2d.dtype),
        interpret=interpret,
    )(*inputs)
    return out[:n] if pad else out


def _reference(x2d, w, bias, ln, res, eps, activation=None):
    x = x2d
    if ln is not None:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu,
                          0.0)
        x = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]
             ).astype(x2d.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32) + bias
    if activation == "gelu":
        y = jax.nn.gelu(y, approximate=True)
    if res is not None:
        y = y + res.astype(jnp.float32)
    return y.astype(x2d.dtype)


@functools.lru_cache(maxsize=None)
def _fused(eps: float, with_ln: bool, with_res: bool, activation,
           interpret: bool):
    @jax.custom_vjp
    def f(x2d, w, bias, g, b, res):
        ln = (g, b) if with_ln else None
        return _fused_linear_pallas(x2d, w, bias, ln,
                                    res if with_res else None, eps,
                                    activation=activation,
                                    interpret=interpret)

    def ref(x2d, w, bias, g, b, res):
        return _reference(x2d, w, bias, (g, b) if with_ln else None,
                          res if with_res else None, eps, activation)

    def fwd(*a):
        return f(*a), a

    def bwd(resids, grad):
        _, vjp = jax.vjp(ref, *resids)
        return vjp(grad)

    f.defvjp(fwd, bwd)
    return f


def linear_fused(x, w, bias, *, ln=None, residual=None, activation=None,
                 eps=1e-6, interpret=False, vmem_budget=9 * 1024 * 1024):
    """(..., din) → (..., dout) fused LN→matmul→+residual.

    Falls back to XLA when off-TPU, when the weight doesn't fit VMEM, or for
    non-bf16 activations."""
    din = x.shape[-1]
    dout = w.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, din)
    r2d = residual.reshape(-1, dout) if residual is not None else None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    fits = w.size * 2 <= vmem_budget
    if (on_tpu or interpret) and fits and x.dtype == jnp.bfloat16 \
            and din % 128 == 0 and dout % 128 == 0:
        g = ln[0] if ln is not None else jnp.ones((din,), jnp.float32)
        b = ln[1] if ln is not None else jnp.zeros((din,), jnp.float32)
        r = r2d if r2d is not None else jnp.zeros((1, dout), x.dtype)
        out = _fused(float(eps), ln is not None, r2d is not None,
                     activation, bool(interpret))(x2d, w, bias, g, b, r)
        return out.reshape(*lead, dout)
    return _reference(x2d, w, bias, ln, r2d, eps,
                      activation).reshape(*lead, dout)
