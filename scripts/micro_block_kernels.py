"""Per-kernel timing of the 3-kernel int8 block (chained fori_loop timing).

Shapes: batch 256 imgs x 256 tokens, base-256 geometry (W=768)."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpudf.ops.int8_block import attn_out_int8, ln_qkv_int8
from tpudf.ops.mlp import mlp_block_fused_int8
from tpudf.ops.quant import quantize_weight

B, S, W, INTER, HEADS = 256, 256, 768, 3072, 12
HD = W // HEADS
ITERS = 60


def bench_chain(f, x0, label, flops):
    def body(i, c):
        out = f(c)
        s = (1e-12 * jnp.sum(out.astype(jnp.float32))).astype(c.dtype)
        return c + jnp.zeros_like(c) + s
    g = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, body, x))
    out = g(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"op": label, "ms": round(dt * 1e3, 3),
                      "tflops_equiv": round(flops / dt / 1e12, 1)}))
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, S, W)), jnp.bfloat16)
    ln = {"scale": jnp.ones((W,), jnp.float32),
          "bias": jnp.zeros((W,), jnp.float32)}
    qkv_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.03, (W, 3 * W)),
                                         jnp.float32))
    qkv_b = jnp.zeros((3 * W,), jnp.float32)
    out_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.03, (W, W)),
                                         jnp.float32))
    out_b = jnp.zeros((W,), jnp.float32)
    mlp_q = {"fc1_w": quantize_weight(jnp.asarray(
                 rng.normal(0, 0.03, (W, INTER)), jnp.float32)),
             "fc1_b": jnp.zeros((INTER,), jnp.float32),
             "fc2_w": quantize_weight(jnp.asarray(
                 rng.normal(0, 0.03, (INTER, W)), jnp.float32)),
             "fc2_b": jnp.zeros((W,), jnp.float32)}

    m = B * S
    t1 = bench_chain(
        lambda c: ln_qkv_int8(c, ln, qkv_wq, qkv_b, 3.0)[..., :W],
        x, "K1_ln_qkv_int8", 2 * m * W * 3 * W)

    qkv = jnp.asarray(rng.normal(0, 1, (B, S, 3 * W)), jnp.bfloat16)
    t2 = bench_chain(
        lambda c: attn_out_int8(qkv + c[..., :1] * 0, c, out_wq, out_b,
                                2.0, HEADS, HD),
        x, "K2_attn_out_int8",
        2 * m * W * W + 4 * B * S * S * W)

    t3 = bench_chain(
        lambda c: mlp_block_fused_int8(c, ln, mlp_q,
                                       {"fc1": 3.0, "fc2": 2.0}),
        x, "K3_mlp_int8", 4 * m * W * INTER)

    tot = (t1 + t2 + t3) * 12
    print(json.dumps({"op": "sum_x12_ms", "ms": round(tot * 1e3, 1),
                      "img_s_bound": round(B / tot, 1)}))


if __name__ == "__main__":
    main()
