"""Measure whether the MXU runs int4-weight matmuls faster than int8.

The deployed base-256 tower is at its int8-matmul roofline
(scripts/ablate_deployed.py): the remaining levers are fewer token-layers
(ToMe) or a faster MXU mode. If the part sustains int4xint8 (or int4xint4)
dot_generals above the ~209 TOP/s int8 rate at our shapes, W4A8 weights
are the next deployment step; if not, we record the negative result.

Timing uses scripts/devtime.py (chained fori_loop; the tunnel's
block_until_ready returns early and coalesces identical dispatches).

Usage: python scripts/micro_int4.py
"""
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from devtime import devtime  # noqa: E402


def bench(m, k, n, wdtype, adtype, label):
    key = jax.random.key(0)
    w8 = jax.random.randint(key, (k, n), -8, 8, jnp.int8)
    xf = jax.random.uniform(jax.random.key(1), (m, k), jnp.float32)

    def f(w, xf):
        x = (xf * 7.0).astype(jnp.int8).astype(adtype)
        y = jax.lax.dot_general(x, w.astype(wdtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32))

    try:
        dt = devtime(f, w8, xf, iters=30)
    except Exception as e:
        print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:140]})")
        return None
    tops = 2.0 * m * k * n / dt / 1e12
    print(f"{label}: {dt*1e6:9.1f} us/iter  {tops:7.1f} TOP/s")
    return tops


if __name__ == "__main__":
    print("devices:", jax.devices())
    for (m, k, n) in [(8192, 1024, 4096), (8192, 768, 2304)]:
        print(f"-- {m}x{k}x{n}")
        bench(m, k, n, jnp.int8, jnp.int8, "  int8w x int8a")
        bench(m, k, n, jnp.int4, jnp.int8, "  int4w x int8a")
        bench(m, k, n, jnp.int4, jnp.int4, "  int4w x int4a")
        bench(m, k, n, jnp.bfloat16, jnp.bfloat16, "  bf16  x bf16 ")
