"""Ablation profile of the int8-static tower: times variants with pieces
knocked out to locate the bottleneck (tunnel-dispatch overhead, attention,
projections, patch embed, head)."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models import siglip as S
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)


def bench(fn, *args, iters=30):
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
    scales = calibrate_siglip_act_scales(
        backbone, cfg, (pixels[:32] - 0.5) / 0.5, DEFAULT_POLICY)
    bb_q = quantize_siglip_static(backbone, scales)

    # 0) dispatch overhead: trivial jitted fn
    tiny = jax.jit(lambda x: x.sum())
    dt = bench(tiny, pixels)
    print(json.dumps({"op": "dispatch_overhead_ms", "ms": round(dt * 1e3, 3)}))

    # 1) full tower int8
    def tower(bb, px):
        norm = (px - 0.5) / 0.5
        feats = siglip_forward(bb, norm, cfg, DEFAULT_POLICY)["pooled"]
        return apply_binary_head(head, feats)
    f = jax.jit(tower)
    for name, bb in (("full_bf16", backbone), ("full_int8", bb_q)):
        dt = bench(f, bb, pixels)
        print(json.dumps({"op": name, "img_s": round(b / dt, 1),
                          "ms": round(dt * 1e3, 2)}))

    # 2) embed-only (patchify + pos): skip all blocks + head
    def embed_only(bb, px):
        norm = ((px - 0.5) / 0.5).astype(DEFAULT_POLICY.compute_dtype)
        x = S.patchify(norm, cfg.patch_size)
        x = x @ bb["embed"]["kernel"].astype(x.dtype) \
            + bb["embed"]["bias"].astype(x.dtype)
        return x.sum()
    dt = bench(jax.jit(embed_only), backbone, pixels)
    print(json.dumps({"op": "embed_only", "ms": round(dt * 1e3, 2)}))

    # 3) blocks with attention knocked out (identity) — int8 projections only
    import tpudf.ops.attention as A
    real_attn = A.attention_qkv

    def fake_attn(qkv, heads, head_dim, scale=None, **kw):
        w = qkv.shape[-1] // 3
        return qkv[..., :w]
    try:
        A.attention_qkv = fake_attn
        S.attention_qkv = fake_attn
        f2 = jax.jit(tower)
        for name, bb in (("noattn_bf16", backbone), ("noattn_int8", bb_q)):
            dt = bench(f2, bb, pixels)
            print(json.dumps({"op": name, "img_s": round(b / dt, 1),
                              "ms": round(dt * 1e3, 2)}))
    finally:
        A.attention_qkv = real_attn
        S.attention_qkv = real_attn

    # 4) batch sweep on the int8 tower
    for bb_sz in (128, 512, 1024):
        px = jax.random.uniform(jax.random.key(7), (bb_sz, 256, 256, 3),
                                jnp.float32)
        dt = bench(f, bb_q, px, iters=max(8, 2048 // bb_sz))
        print(json.dumps({"op": f"int8_batch_{bb_sz}",
                          "img_s": round(bb_sz / dt, 1),
                          "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
