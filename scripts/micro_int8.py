"""Microbenchmark: int8 vs bf16 matmul rate on the v5e MXU, plus the cost of
dynamic activation quantization — decides whether the int8 inference path is
worth a fused Pallas kernel.

Each timed graph CHAINS `iters` matmuls with a data dependency (output row
folded back into the input) so the device cannot overlap/elide repeated
dispatches — one dispatch, `iters` sequential MXU ops.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

ITERS = 30


def chain(step):
    def run(x, *rest):
        def body(i, x):
            y = step(x, *rest)
            # fold a live function of y back into x so XLA can neither
            # dead-code the matmul nor overlap iterations
            return x + y[:, :1].astype(x.dtype) * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    m, k, n = 16384, 768, 3072          # ViT-B fc1 at batch 64 x 256 tokens
    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    w_scale = jnp.ones((n,), jnp.float32)
    flops = 2 * m * k * n

    f_bf = chain(lambda a, b: jax.lax.dot(a, b))

    def i8_deq(a_bf, b, s):
        q = a_bf.astype(jnp.int8)        # fixed cast, no dynamic range
        acc = jax.lax.dot_general(q, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s).astype(jnp.bfloat16)
    f_i8 = chain(i8_deq)

    def dynq(a_bf, b, s):
        amax = jnp.max(jnp.abs(a_bf), axis=-1, keepdims=True)
        sc = jnp.where(amax > 0, amax.astype(jnp.float32) / 127.0, 1.0)
        q = jnp.clip(jnp.round(a_bf.astype(jnp.float32) / sc),
                     -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(q, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sc * s).astype(jnp.bfloat16)
    f_dynq = chain(dynq)

    def bf16_w_i8(a_bf, b, s):           # weight-only: dequant w, bf16 MXU
        wd = (b.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jax.lax.dot(a_bf, wd)
    f_wonly = chain(bf16_w_i8)

    for name, fn, args in (
            ("bf16", f_bf, (x_bf, w_bf)),
            ("int8_static_act", f_i8, (x_bf, w_i8, w_scale)),
            ("int8_dynamic_act", f_dynq, (x_bf, w_i8, w_scale)),
            ("bf16_weight_only_int8", f_wonly, (x_bf, w_i8, w_scale))):
        dt = timeit(fn, *args)
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 3),
                          "tflops": round(flops / dt / 1e12, 1)}))


if __name__ == "__main__":
    main()
