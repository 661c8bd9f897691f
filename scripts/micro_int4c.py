"""int4 vs int8 matmul rate, long-chain edition.

micro_int4b.py's iters=10..40 chains put ~1 ms of signal against the
tunnel's ~33 ms round-trip — slopes came out negative. Here each dtype is
timed as the slope between chain lengths 100 and 400 (≈30-90 ms of device
work at these shapes), reps=5 median, which bounds RTT noise to a few %.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def chain(f, iters, wdtype):
    # int4 arrays can't cross the tunnel's device_put (RecursionError in
    # jax 0.8 axon); ship int8 and cast ONCE inside the jit, before the
    # timing loop, so the cast isn't part of the measured body.
    def run(w8, xf, seed):
        w = w8.astype(wdtype)

        def body(_, acc):
            eps = ((acc + seed) * 1e-30).astype(xf.dtype)
            out = f(w, xf + eps)
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return jax.jit(run)


def slope(f, *args, wdtype, lo=64, hi=256, reps=3):
    glo, ghi = chain(f, lo, wdtype), chain(f, hi, wdtype)
    seeds = [jnp.float32(i * 1e-7) for i in range(2 * reps + 2)]
    float(jax.device_get(glo(*args, seeds[-1])))
    float(jax.device_get(ghi(*args, seeds[-2])))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(glo(*args, seeds[2 * i])))
        t1 = time.perf_counter()
        float(jax.device_get(ghi(*args, seeds[2 * i + 1])))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
    ts.sort()
    return ts[len(ts) // 2]


def bench(m, k, n, wdtype, label):
    w8 = jax.random.randint(jax.random.key(0), (k, n), -8, 8, jnp.int8)
    xf = jax.random.uniform(jax.random.key(1), (m, k), jnp.float32)

    def f(w, xf):
        x = (xf * 7.0).astype(jnp.int8)
        if w.dtype == jnp.bfloat16:
            x = x.astype(jnp.bfloat16)
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32), keepdims=True)

    dt = slope(f, w8, xf, wdtype=wdtype)
    tops = 2.0 * m * k * n / dt / 1e12
    print(f"{label}: {dt*1e6:9.1f} us/iter  {tops:7.1f} TOP/s", flush=True)
    return tops


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    import sys
    shapes = [(8192, 768, 2304)]
    if "--all" in sys.argv:
        shapes += [(8192, 768, 3072), (8192, 1152, 3456), (4096, 768, 2304)]
    for (m, k, n) in shapes:
        print(f"-- {m}x{k}x{n}", flush=True)
        bench(m, k, n, jnp.int8, "  int8w")
        bench(m, k, n, jnp.int4, "  int4w")
