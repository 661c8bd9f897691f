"""Trustworthy device timing through the tunneled dev chip.

The tunnel's block_until_ready can return before execution completes, and
repeated identical (executable, args) dispatches may be coalesced — naive
timing loops report physically impossible numbers (measured: a 4096^3 bf16
matmul "at 7,700 TF/s" on a 197 TF/s chip). The only reliable sync is
fetching result bytes (jax.device_get).

devtime(f, *args) runs f K times INSIDE one jit via lax.fori_loop with a
data-dependent perturbation chained through the loop (no dedup possible,
strict serial execution), fetches a scalar, and subtracts the 1-iteration
run so the ~33 ms host<->chip round trip cancels:

    per_iter = (T(K) - T(1)) / (K - 1)

Each timed call carries a DISTINCT scalar seed argument (folded into the
perturbation) so the runtime can never coalesce it with an earlier
identical dispatch — without copying the (possibly GB-sized) input.

Used by bench.py and the profiling scripts.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _chained(f, iters):
    def run(*args_and_seed):
        *args, seed = args_and_seed

        def body(_, acc):
            # cast the perturbation to the arg's dtype: an f32 scalar would
            # silently promote a bf16 input array to f32 and change the
            # measured graph's HBM traffic
            eps = ((acc + seed) * 1e-30).astype(args[-1].dtype)
            out = f(*args[:-1], args[-1] + eps)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return acc + s * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return jax.jit(run)


def devtime(f, *args, iters: int = 10, reps: int = 3) -> float:
    """Median per-iteration device seconds of f(*args). The LAST argument
    must be a float array (it carries the chain perturbation)."""
    g1 = _chained(f, 1)
    gk = _chained(f, iters)
    seeds = [jnp.float32(i * 1e-7) for i in range(2 * reps + 2)]
    # compile both + one warm fetch each
    float(jax.device_get(g1(*args, seeds[-1])))
    float(jax.device_get(gk(*args, seeds[-2])))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(g1(*args, seeds[2 * i])))
        t1 = time.perf_counter()
        float(jax.device_get(gk(*args, seeds[2 * i + 1])))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (iters - 1))
    ts.sort()
    return ts[len(ts) // 2]
