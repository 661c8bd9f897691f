"""Attainable matmul rates on the v5e for the tower's projection shapes.

Timing: chained lax.fori_loop inside ONE jit (each iteration's input depends
on the previous output) — per-dispatch loops mis-time sub-ms ops through the
axon tunnel (queued executions overlap and report physically impossible
rates). The chain adds one full read of the output per iteration (the sum),
identical across variants.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

M = 256 * 256            # batch 256 images x 256 tokens
SHAPES = [("qkv", 768, 2304), ("out", 768, 768),
          ("fc1", 768, 3072), ("fc2", 3072, 768)]
ITERS = 50


def chained(f, x0, *rest):
    def body(i, carry):
        out = f(carry, *rest)
        return carry + (1e-12 * jnp.sum(out.astype(jnp.float32))
                        ).astype(carry.dtype)
    return jax.lax.fori_loop(0, ITERS, body, x0)


def bench_chain(f, x, *rest):
    g = jax.jit(lambda x, *r: chained(f, x, *r))
    out = g(x, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(x, *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def tf(k, n, dt):
    return round(2 * M * k * n / dt / 1e12, 1)


def main():
    rng = np.random.default_rng(0)
    for name, k, n in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (M, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.04, (k, n)), jnp.float32)
        ws = jnp.max(jnp.abs(w), 0) / 127.0
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        ws = ws.astype(jnp.float32)
        wb = w.astype(jnp.bfloat16)

        r = {"shape": f"{name} {k}x{n}"}
        dt = bench_chain(lambda a, b: (a @ b).astype(jnp.bfloat16), x, wb)
        r["bf16_xla"] = tf(k, n, dt)

        def i8q(a, b, s):
            q = jnp.clip(jnp.round(a.astype(jnp.float32) * (127.0 / 4.0)),
                         -127, 127).astype(jnp.int8)
            return (jax.lax.dot_general(
                q, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
                * ((4.0 / 127.0) * s)).astype(jnp.bfloat16)
        dt = bench_chain(i8q, x, wq, ws)
        r["int8_xla_quant"] = tf(k, n, dt)

        print(json.dumps(r))


if __name__ == "__main__":
    main()
