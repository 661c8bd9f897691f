"""Tower throughput: bf16 fused-Pallas path vs static-scale W8A8 path, plus
the full detect graph on both. Honest timing: per-dispatch loop (tunnel
backpressure makes this ~real device time, cross-checked vs BENCH_r01)."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = CONFIGS["base-256"]
    key = jax.random.key(0)
    k1, k2, k5 = jax.random.split(key, 3)
    backbone = init_siglip(k1, cfg)
    head = init_binary_head(k2, cfg.width)

    b = 256
    pixels = jax.random.uniform(k5, (b, 256, 256, 3), jnp.float32)
    calib = pixels[:32]
    scales = calibrate_siglip_act_scales(backbone, cfg, (calib - 0.5) / 0.5,
                                         DEFAULT_POLICY)
    bb_q = quantize_siglip_static(backbone, scales)

    def tower(bb, px):
        norm = (px - 0.5) / 0.5
        feats = siglip_forward(bb, norm, cfg, DEFAULT_POLICY)["pooled"]
        return apply_binary_head(head, feats)

    f = jax.jit(tower)
    for name, bb in (("tower_bf16_fused", backbone),
                     ("tower_int8_static", bb_q)):
        dt = bench(f, bb, pixels)
        print(json.dumps({"op": name, "img_s": round(b / dt, 1),
                          "tflops_bf16_equiv": round(b / dt * 48 / 1000, 1)}))

    # numerical check on-chip
    ref = f(backbone, pixels[:16])
    got = f(bb_q, pixels[:16])
    diff = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"op": "logit_max_abs_diff_bf16_vs_int8",
                      "value": round(diff, 4)}))


if __name__ == "__main__":
    main()
