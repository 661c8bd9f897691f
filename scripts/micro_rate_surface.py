"""int8 MXU rate as a function of matmul shape on the v5e.

ablate_deployed.py proved the base-256 tower equals its own matmul floor,
and micro_packedhead.py showed the SAME chip sustains 369 TOP/s at
K=1152/N=6144 vs ~220 at the base-256 K=768/N=2304 — the floor is
shape-dependent, not a global fabric constant. This maps the (K, N) rate
surface at M=8192 to see which regions are fast and whether any legal
restructuring of the tower's matmuls (wider fused N, deeper K) could move
them into a faster region.

Long-chain devtime (lo=64 hi=256 fori_loop slope, reps=3).
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax
import jax.numpy as jnp

from _slope import slope  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def rate(m, k, n):  # noqa: D103 — M rows, contraction K, output cols N
    w = jax.random.randint(jax.random.key(0), (k, n), -127, 128, jnp.int8)
    x = jax.random.uniform(jax.random.key(1), (m, k), jnp.float32)

    def f(w, xf):
        x8 = (xf * 100).astype(jnp.int8)
        y = jax.lax.dot_general(x8, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y).astype(jnp.float32)

    dt = slope(f, w, x, lo=64, hi=256, reps=3)
    return 2.0 * m * k * n / dt / 1e12


if __name__ == "__main__":
    import sys
    print("devices:", jax.devices(), flush=True)
    M = 8192
    base = [(8192, 768, 2304, "qkv b256"), (8192, 768, 768, "out b256"),
            (8192, 768, 3072, "fc1 b256"), (8192, 3072, 768, "fc2 b256")]
    # feature-major (transposed) equivalents: y^T = W^T x^T puts the 8192
    # batch-token axis on N for every projection
    transposed = [(2304, 768, 8192, "qkv-T"), (768, 768, 8192, "out-T"),
                  (3072, 768, 8192, "fc1-T"), (768, 3072, 8192, "fc2-T")]
    todo = base + (transposed if "--probes" in sys.argv else [])
    for m, k, n, tag in todo:
        r = rate(m, k, n)
        print(f"M={m:5d} K={k:5d} N={n:5d}  {r:7.1f} TOP/s   [{tag}]",
              flush=True)
