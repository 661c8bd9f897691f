"""Validate the surprising int4 matmul rates from micro_int4.py.

Checks (a) numerics: int4w x int8a must equal int8w x int8a bit-exactly
when weights are in [-8,7]; (b) timing linearity in chain length (a
too-good rate from dispatch coalescing would not scale with iters);
(c) a shape sweep around the deployed kernel shapes.
"""
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from devtime import devtime  # noqa: E402


def make(m, k, n):
    key = jax.random.key(0)
    w8 = jax.random.randint(key, (k, n), -8, 8, jnp.int8)
    xf = jax.random.uniform(jax.random.key(1), (m, k), jnp.float32)
    return w8, xf


def f_dtype(wdtype):
    def f(w, xf):
        x = (xf * 7.0).astype(jnp.int8)
        y = jax.lax.dot_general(x, w.astype(wdtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32)), y[0, :4]
    return f


if __name__ == "__main__":
    # (a) numerics
    w8, xf = make(512, 768, 2304)
    s8, y8 = jax.jit(f_dtype(jnp.int8))(w8, xf)
    s4, y4 = jax.jit(f_dtype(jnp.int4))(w8, xf)
    print("numerics: sums", float(s8), float(s4), "equal:",
          bool(s8 == s4), "rows equal:", bool(jnp.all(y8 == y4)))

    # (b) linearity: per-iter time should be stable across chain lengths
    w8, xf = make(8192, 768, 2304)
    for dt_name, wdtype in [("int8", jnp.int8), ("int4", jnp.int4)]:
        def f(w, xf, wdtype=wdtype):
            x = (xf * 7.0).astype(jnp.int8)
            y = jax.lax.dot_general(x, w.astype(wdtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.sum(y.astype(jnp.float32))
        for iters in (10, 40):
            dt = devtime(f, w8, xf, iters=iters)
            tops = 2.0 * 8192 * 768 * 2304 / dt / 1e12
            print(f"{dt_name} iters={iters}: {dt*1e6:8.1f} us  "
                  f"{tops:7.1f} TOP/s")

    # (c) shape sweep
    for (m, k, n) in [(8192, 768, 768), (8192, 768, 3072),
                      (8192, 1152, 3456), (8192, 2048, 1152),
                      (4096, 768, 2304), (16384, 768, 2304)]:
        w8, xf = make(m, k, n)
        row = f"{m}x{k}x{n}:"
        for dt_name, wdtype in [("int8", jnp.int8), ("int4", jnp.int4)]:
            def f(w, xf, wdtype=wdtype):
                x = (xf * 7.0).astype(jnp.int8)
                y = jax.lax.dot_general(x, w.astype(wdtype),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return jnp.sum(y.astype(jnp.float32))
            dt = devtime(f, w8, xf, iters=20)
            row += f"  {dt_name} {2.0*m*k*n/dt/1e12:7.1f} TOP/s"
        print(row)
