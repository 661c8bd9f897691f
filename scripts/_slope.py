"""Shared long-chain device-timing harness for the scripts/ benchmarks.

Methodology (one canonical copy — r3 advisor): time a jitted chain of
`iters` dependent calls at two lengths and report the per-call slope
(median of reps), which cancels dispatch/fetch overhead through the
tunneled dev chip. The chained input perturbation must be data-dependent
and non-foldable (`* 1e-30`, not `* 0`) or XLA hoists the body's input
prep out of the loop and the measured graph changes (observed: 163 vs
220 TOP/s for the same shape — micro_rate_surface).

The perturbation is applied to the LAST positional argument (the
activation); leading args (weights, params) pass through untouched.
"""

import time

import jax
import jax.numpy as jnp


def chain(f, iters):
    def run(*args_and_seed):
        *args, seed = args_and_seed
        head, x = list(args[:-1]), args[-1]

        def body(_, acc):
            out = f(*head, x + ((acc + seed) * 1e-30).astype(x.dtype))
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return jax.jit(run)


def slope(f, *args, lo=4, hi=16, reps=5):
    """Median per-call seconds of f(*args) from the (hi - lo) chain slope."""
    glo, ghi = chain(f, lo), chain(f, hi)
    seeds = [jnp.float32(i * 1e-7) for i in range(2 * reps + 2)]
    float(jax.device_get(glo(*args, seeds[-1])))        # compile
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
