"""Probe: what caps the static-int8 matmul at ~250 TOPs effective on the
v5e — MXU scheduling or the VPU prologue/epilogue (quantize, f32 dequant,
bias, gelu)?

Times kernel variants of the fc1-shaped matmul (rows=512 tile, K=768,
N=3072) with pieces of the VPU work removed, plus int8-in/int32-out as the
pure-MXU ceiling. Chained fori_loop (data dependency between iterations) so
the tunnel relay cannot pipeline/dedupe dispatches.
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, N = 65536, 768, 3072          # 256 imgs x 256 tokens, fc1 shape
ROWS = 512
ITERS = 20
OPS = 2 * M * K * N  # per single matmul


def k_full(x_ref, w_ref, s_ref, b_ref, o_ref):
    """Current production epilogue: f32 quant + int8 dot + f32 dequant+bias
    + gelu + bf16 store."""
    x = x_ref[...].astype(jnp.float32)
    q = jnp.clip(jnp.round(x * (127.0 / 4.0)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    h = acc.astype(jnp.float32) * ((4.0 / 127.0) * s_ref[...]) + b_ref[...]
    o_ref[...] = jax.nn.gelu(h, approximate=True).astype(o_ref.dtype)


def k_nogelu(x_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    q = jnp.clip(jnp.round(x * (127.0 / 4.0)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * ((4.0 / 127.0) * s_ref[...])
                  + b_ref[...]).astype(o_ref.dtype)


def k_bf16_epi(x_ref, w_ref, s_ref, b_ref, o_ref):
    """Dequant chain in bf16 instead of f32."""
    x = x_ref[...].astype(jnp.float32)
    q = jnp.clip(jnp.round(x * (127.0 / 4.0)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    h = acc.astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16) \
        + b_ref[...].astype(jnp.bfloat16)
    o_ref[...] = h


def k_noquant(x_ref, w_ref, s_ref, b_ref, o_ref):
    """int8 input already (no prologue quantize), f32 dequant epilogue."""
    acc = jax.lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * ((4.0 / 127.0) * s_ref[...])
                  + b_ref[...]).astype(o_ref.dtype)


def k_pure(x_ref, w_ref, s_ref, b_ref, o_ref):
    """int8 in, raw int32 accumulate out — pure MXU ceiling."""
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def make(kernel, out_dtype, iters, rows=ROWS):
    def call(x, w, s, b):
        return pl.pallas_call(
            kernel,
            grid=(M // rows,),
            in_specs=[
                pl.BlockSpec((rows, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
                pl.BlockSpec((N,), lambda i: (0,)),
                pl.BlockSpec((N,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((rows, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        )(x, w, s, b)

    @jax.jit
    def run(x, w, s, b):
        def body(i, x):
            y = call(x, w, s, b)
            # fold a live function of y back into x: forces sequential
            # iters. NOTE a float `x + y*1e-6` rounds away in bf16 and XLA
            # hoists the whole matmul out of the loop — flip x's low
            # mantissa bit by y's parity instead (1 ulp, never foldable).
            if x.dtype == jnp.int8:
                return x ^ (y[:, :K].astype(jnp.int8) & 1)
            yb = y[:, :K].astype(jnp.bfloat16)
            xb = jax.lax.bitcast_convert_type(x, jnp.uint16)
            p = jax.lax.bitcast_convert_type(yb, jnp.uint16) & 1
            return jax.lax.bitcast_convert_type(xb ^ p, jnp.bfloat16)
        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32))
    return run


def bench(kernel, odt, xs, w, s, b):
    """Marginal-time method: the tunnel adds ~30 ms fixed RTT per fetched
    scalar and dedupes identical dispatches, so (a) every timed call uses a
    fresh device-resident input, (b) rate = (t_long - t_short) / extra
    iters. Returns seconds per matmul."""
    short, long_ = 8, 32
    ts = {}
    for iters in (short, long_):
        run = make(kernel, odt, iters)
        float(run(xs[0], w, s, b))          # compile (scalar fetch = sync;
        best = float("inf")                 # block_until_ready alone does
        for xi in xs[1:]:                   # not sync through the relay)
            t0 = time.perf_counter()
            float(run(xi, w, s, b))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[long_] - ts[short]) / (long_ - short)


def main():
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s = jnp.asarray(rng.random(N) * 0.01 + 0.01, jnp.float32)
    b = jnp.asarray(rng.random(N), jnp.float32)
    xs_bf = [jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
             for _ in range(3)]
    xs_i8 = [jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
             for _ in range(3)]

    cases = [
        ("full (quant+dot+dequant+gelu)", k_full, xs_bf, jnp.bfloat16),
        ("nogelu (quant+dot+dequant)", k_nogelu, xs_bf, jnp.bfloat16),
        ("bf16 epilogue", k_bf16_epi, xs_bf, jnp.bfloat16),
        ("noquant (i8 in, f32 dequant)", k_noquant, xs_i8, jnp.bfloat16),
        ("pure (i8 in, i32 out; HBM-bound)", k_pure, xs_i8, jnp.int32),
    ]
    for name, kern, xs, odt in cases:
        try:
            dt = bench(kern, odt, xs, w8, s, b)
            print(f"{name:36s} {dt*1e3:7.3f} ms/matmul  "
                  f"{OPS/dt/1e12:6.1f} TOPs")
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
