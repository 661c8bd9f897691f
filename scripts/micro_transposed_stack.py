"""Feature-major (transposed) tower orientation: full-stack validation.

micro_rate_surface.py measured per-shape int8 rates: the base-256 tower's
narrow-N matmuls (out-proj and fc2, N=768) sustain ~110 TOP/s while their
transposed forms (y^T = W^T x^T, batch-token axis on N=8192) sustain
144-173 — a ~24% weighted matmul-floor reduction. This chains all FOUR
projection matmuls per layer over the deployed ToMe token schedule in both
orientations to check the win survives in a realistic dependent stack
(per-shape micros can flatter or slander due to tunnel noise).

Usage: python scripts/micro_transposed_stack.py
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

from tpudf.models.siglip import CONFIGS  # noqa: E402
from tpudf.ops.tome import deployed_floor, merge_schedule  # noqa: E402

B = 256
CFG = CONFIGS["base-256"]


def make_weights(w, m, transposed):
    q8 = lambda k, shape: jax.random.randint(
        jax.random.key(k), shape, -127, 128, jnp.int8)
    if transposed:
        return (q8(1, (3 * w, w)), q8(2, (w, w)),
                q8(3, (m, w)), q8(4, (w, m)))
    return (q8(1, (w, 3 * w)), q8(2, (w, w)),
            q8(3, (w, m)), q8(4, (m, w)))


def stack_fn(toks, w, m, transposed):
    wqkv, wout, wfc1, wfc2 = make_weights(w, m, transposed)
    dn = (((1,), (0,)), ((), ()))

    def f(xf):
        acc = jnp.zeros((), jnp.float32)
        x8 = jnp.clip(xf, -127, 127).astype(jnp.int8)
        for s in toks:
            rows = B * s
            if transposed:
                xi = x8[:, :rows]                       # (w, rows)
                a = jax.lax.dot_general(wqkv, xi, dn,
                                        preferred_element_type=jnp.int32)
                o = a[:w].astype(jnp.int8)              # (w, rows)
                b = jax.lax.dot_general(wout, o, dn,
                                        preferred_element_type=jnp.int32)
                c = jax.lax.dot_general(wfc1, b.astype(jnp.int8), dn,
                                        preferred_element_type=jnp.int32)
                d = jax.lax.dot_general(wfc2, c.astype(jnp.int8), dn,
                                        preferred_element_type=jnp.int32)
                acc = acc + jnp.sum(d[:1, :8]).astype(jnp.float32) * 1e-30
                x8 = x8 + acc.astype(jnp.int8)
            else:
                xi = x8[:rows]                          # (rows, w)
                a = jax.lax.dot_general(xi, wqkv, dn,
                                        preferred_element_type=jnp.int32)
                o = a[:, :w].astype(jnp.int8)
                b = jax.lax.dot_general(o, wout, dn,
                                        preferred_element_type=jnp.int32)
                c = jax.lax.dot_general(b.astype(jnp.int8), wfc1, dn,
                                        preferred_element_type=jnp.int32)
                d = jax.lax.dot_general(c.astype(jnp.int8), wfc2, dn,
                                        preferred_element_type=jnp.int32)
                acc = acc + jnp.sum(d[:1, :8]).astype(jnp.float32) * 1e-30
                x8 = x8 + acc.astype(jnp.int8)
        return acc
    return f


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = CFG
    s0 = cfg.num_patches
    sched = merge_schedule(s0, cfg.layers, 64, min_tokens=deployed_floor(s0))
    toks = [s0]
    for r in sched:
        toks.append(toks[-1] - r)
    toks = toks[:cfg.layers]
    print(f"token schedule: {toks}", flush=True)
    w, m = cfg.width, cfg.mlp_dim
    flops = sum(2.0 * B * s * w * (3 * w + w + 2 * m) for s in toks)
    for transposed in (False, True):
        shape = (w, B * s0) if transposed else (B * s0, w)
        x = jax.random.uniform(jax.random.key(0), shape, jnp.float32) * 64
        dt = slope(stack_fn(toks, w, m, transposed), x, lo=16, hi=64, reps=5)
        tag = "transposed" if transposed else "normal    "
        print(f"{tag}: {dt*1e3:8.3f} ms/pass  {flops/dt/1e12:7.1f} TOP/s",
              flush=True)


if __name__ == "__main__":
    main()
