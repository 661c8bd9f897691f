"""Long-chain re-measurement of the deployed base-256 tower vs its floor.

micro_transposed_stack.py measured the deployed token schedule's bare
matmul floor at 12.0 ms/256-batch (270 TOP/s sustained) — well below the
~20 ms the r2 ablation attributed to the (larger, floor-64) schedule at
~208 TOP/s with short devtime chains. If the real tower sits above 12 ms,
the roofline story changes: there IS recoverable kernel headroom.

Rows (all long-chain, lo=8/hi=32, reps=5):
  floor       bare int8 projection matmuls, deployed schedule
  deployed    quantized tower (FPP kernels) + ToMe r=64/floor-32
  bf16_tome   unquantized tower with the same ToMe schedule (reference)
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpudf.core.precision import DEFAULT_POLICY  # noqa: E402
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward  # noqa: E402
from tpudf.ops.quant import (calibrate_siglip_act_scales,  # noqa: E402
                             quantize_siglip_static)
from tpudf.ops.tome import deployed_floor, merge_schedule  # noqa: E402

B = 256
CFG = CONFIGS["base-256"]


def floor_fn(toks, w, m):
    q8 = lambda k, shape: jax.random.randint(
        jax.random.key(k), shape, -127, 128, jnp.int8)
    wqkv, wout = q8(1, (w, 3 * w)), q8(2, (w, w))
    wfc1, wfc2 = q8(3, (w, m)), q8(4, (m, w))
    dn = (((1,), (0,)), ((), ()))

    def f(xf):
        acc = jnp.zeros((), jnp.float32)
        x8 = jnp.clip(xf, -127, 127).astype(jnp.int8)
        for s in toks:
            xi = x8[:B * s]
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
    key = jax.random.key(0)
    k1, k5 = jax.random.split(key)
    backbone = init_siglip(k1, cfg)
    pixels = jax.random.uniform(k5, (B, 256, 256, 3), jnp.float32)
    scales = calibrate_siglip_act_scales(
        backbone, cfg, (pixels[:32] - 0.5) / 0.5, DEFAULT_POLICY)
    bb_q = quantize_siglip_static(backbone, scales)
    s0 = cfg.num_patches
    floor_toks = [s0]
    for r in merge_schedule(s0, cfg.layers, 64, min_tokens=deployed_floor(s0)):
        floor_toks.append(floor_toks[-1] - r)
    floor_toks = floor_toks[:cfg.layers]
    print("schedule:", floor_toks, flush=True)

    x = jax.random.uniform(jax.random.key(2), (B * s0, cfg.width),
                           jnp.float32) * 64
    dt = slope(floor_fn(floor_toks, cfg.width, cfg.mlp_dim), x, lo=8, hi=32, reps=5)
    print(f"floor    : {dt*1e3:8.3f} ms  {B/dt:8.0f} img/s-equiv", flush=True)

    def tower(px, bb):
        norm = (px - 0.5) / 0.5
        return siglip_forward(bb, norm, cfg, DEFAULT_POLICY, tome_r=64,
                              tome_floor=deployed_floor(s0))["pooled"]

    for name, bb in (("deployed ", bb_q), ("bf16_tome", backbone)):
        dt = slope(lambda px, bb=bb: tower(px, bb), pixels, lo=8, hi=32, reps=5)
        print(f"{name}: {dt*1e3:8.3f} ms  {B/dt:8.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
