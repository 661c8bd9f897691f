"""Probe: Pallas int8 tile matmul (static activation scale, in-kernel
quantize) vs bf16 tile matmul on the v5e MXU. Decides the int8 fused-kernel
design. Chained fori_loop + scalar fetch for honest timing."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import functools
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, N = 16384, 768, 3072
ROWS = 512
ITERS = 100


def bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(o_ref.dtype)


def int8_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    q = jnp.clip(jnp.round(x * (127.0 / 4.0)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * (4.0 / 127.0) * s_ref[...]
                  ).astype(o_ref.dtype)


def run_bf16(x, w):
    return pl.pallas_call(
        bf16_kernel,
        grid=(M // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((ROWS, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16))(x, w)


def run_int8(x, w, s):
    return pl.pallas_call(
        int8_kernel,
        grid=(M // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0)),
                  pl.BlockSpec((N,), lambda i: (0,))],
        out_specs=pl.BlockSpec((ROWS, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16))(x, w, s)


def chain(step, *rest):
    def run(x):
        def body(i, x):
            y = step(x, *rest)
            return x + y[:, :K] * jnp.bfloat16(1e-3)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((K, N)) * 0.03, jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s = jnp.full((N,), 0.01, jnp.float32)

    flops = 2 * M * K * N * ITERS
    for name, fn in (("pallas_bf16", chain(run_bf16, w_bf)),
                     ("pallas_int8_staticq", chain(run_int8, w_i8, s))):
        v = float(fn(x))
        t0 = time.perf_counter()
        v = float(fn(x))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt / ITERS * 1e3:.3f} ms/mm "
              f"{flops / dt / 1e12:.0f} TFLOP/s (out={v:.3e})")


if __name__ == "__main__":
    main()
