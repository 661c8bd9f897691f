"""Upper-bound the so400m packed-head attention win.

so400m (w=1152, 16 heads, head_dim 72) pays a 72->128 lane pad on QKV and
out-proj: weights (1152, 3*2048) and (2048, 1152) instead of the dense
(1152, 3456) / (1152, 1152). This measures, over the deployed ToMe token
schedule, the summed int8-matmul time of the padded vs dense projection
shapes. The delta is the MOST a packed-head kernel could recover (ignoring
its own in-VMEM repack cost).

Usage: python scripts/micro_packedhead.py
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

B = 16
CFG = CONFIGS["so400m-512"]


def proj_stack(toks, w, qkv_cols, out_rows):
    """Per-layer QKV + out-proj int8 matmuls over the token schedule."""
    wqkv = jax.random.randint(jax.random.key(1), (w, qkv_cols), -127, 128,
                              jnp.int8)
    wout = jax.random.randint(jax.random.key(2), (out_rows, w), -127, 128,
                              jnp.int8)

    def f(x8f):
        acc = jnp.zeros((), jnp.float32)
        x8 = jnp.clip(x8f, -127, 127).astype(jnp.int8)
        for s in toks:
            xi = x8[:B * s].reshape(B * s, w)
            a = jax.lax.dot_general(xi, wqkv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o8 = a[:, :out_rows].astype(jnp.int8)
            b = jax.lax.dot_general(o8, wout, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = acc + jnp.sum(b[:1, :8]).astype(jnp.float32) * 1e-30
            x8 = x8 + acc.astype(jnp.int8)
        return acc
    return f


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = CFG
    s0 = cfg.num_patches
    sched = merge_schedule(s0, cfg.layers, 64,
                           min_tokens=deployed_floor(s0))
    toks = [s0]
    for r in sched:
        toks.append(toks[-1] - r)
    toks = toks[:cfg.layers]
    print(f"token schedule ({len(toks)} layers): {toks}", flush=True)
    w = cfg.width                      # 1152
    dp = 128 * cfg.heads               # padded attn width 2048
    x = jax.random.uniform(jax.random.key(0), (B * s0, w), jnp.float32) * 32

    flops = lambda cols, rows: sum(
        2.0 * B * s * w * cols + 2.0 * B * s * rows * w for s in toks)
    for name, cols, rows in (("padded", 3 * dp, dp),
                             ("dense ", 3 * w, w)):
        dt = slope(proj_stack(toks, w, cols, rows), x, lo=32, hi=128, reps=3)
        print(f"{name}: {dt*1e3:8.3f} ms/pass  "
              f"{flops(cols, rows)/dt/1e12:7.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
