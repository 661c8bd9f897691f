"""Ablation of the large-384 deployed serving tower (int8-static + ToMe
r=64/floor-72, B=32) with the devtime methodology — locates the residual
gap to the int8 matmul roofline (same rows as scripts/ablate_deployed.py,
which proved the base-256 tower AT its floor)."""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from devtime import devtime
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models import siglip as S
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops import int8_block as IB
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)
from tpudf.ops.tome import (DEPLOYED_TOME_R, deployed_floor, merge_schedule,
                            merge_step)

B = 32
CFG = CONFIGS["large-384"]
S0 = (CFG.image_size // CFG.patch_size) ** 2          # 576 tokens
FLOOR = deployed_floor(S0)                            # 72


def main():
    cfg = CFG
    key = jax.random.key(0)
    k1, k2, k5 = jax.random.split(key, 3)
    backbone = init_siglip(k1, cfg)
    head = init_binary_head(k2, cfg.width)
    pixels = jax.random.uniform(k5, (B, cfg.image_size, cfg.image_size, 3),
                                jnp.float32)
    scales = calibrate_siglip_act_scales(
        backbone, cfg, (pixels[:8] - 0.5) / 0.5, DEFAULT_POLICY)
    bb_q = quantize_siglip_static(backbone, scales, cfg)

    def tower(bb, px, tome_r=DEPLOYED_TOME_R):
        norm = (px - 0.5) / 0.5
        feats = siglip_forward(bb, norm, cfg, DEFAULT_POLICY,
                               tome_r=tome_r,
                               tome_floor=FLOOR if tome_r else 0)["pooled"]
        return apply_binary_head(head, feats)

    def row(name, dt):
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 3),
                          "img_s": round(B / dt, 1)}), flush=True)

    row("deployed_tome_fpp", devtime(tower, bb_q, pixels))

    # ---- matmul floor: same projection shapes, pure int8 dot_generals
    sched = merge_schedule(S0, cfg.layers, DEPLOYED_TOME_R,
                           min_tokens=FLOOR)
    toks = [S0]
    for r in sched:
        toks.append(toks[-1] - r)
    w, m = cfg.width, cfg.mlp_dim
    q8 = lambda k, shape: jax.random.randint(
        jax.random.key(k), shape, -127, 128, jnp.int8)
    wqkv, wout = q8(1, (w, 3 * w)), q8(2, (w, w))
    wfc1, wfc2 = q8(3, (w, m)), q8(4, (m, w))

    def floor_fn(wqkv, wout, wfc1, wfc2, px):
        flat = jnp.tile(px.reshape(B, -1), (1, 2))[:, :S0 * w]
        x = flat.reshape(B, S0, w)
        x = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
        acc = jnp.zeros((), jnp.float32)
        for i in range(cfg.layers):
            s = toks[i]
            xi = x[:, :s].reshape(B * s, w)
            a = jax.lax.dot_general(xi, wqkv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            b2 = jax.lax.dot_general(a[:, :w].astype(jnp.int8), wout,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            c = jax.lax.dot_general(b2.astype(jnp.int8), wfc1,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            d = jax.lax.dot_general(c[:, :m].astype(jnp.int8), wfc2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = acc + jnp.sum(d).astype(jnp.float32) * 1e-30
            x = x + acc.astype(jnp.int8)
        return acc
    row("matmul_floor", devtime(floor_fn, wqkv, wout, wfc1, wfc2, pixels))

    # ---- per-head attention loop knocked out
    real = IB.attn_sublayer_int8

    def no_headloop(x, ln_params, qkv_wq, qkv_b, out_wq, out_b,
                    a_qkv, a_out, heads, head_dim, eps=1e-6, scale=None, *,
                    logit_bias=None, interpret=False):
        qkv = IB.ln_qkv_int8(x, ln_params, qkv_wq, qkv_b, a_qkv, eps,
                             interpret=interpret)
        wa = heads * head_dim
        o = qkv[..., :wa]
        a = jnp.asarray(a_out, jnp.float32)
        o8 = jnp.clip(jnp.round(o.astype(jnp.float32) * (127.0 / a)),
                      -127, 127).astype(jnp.int8)
        accp = jax.lax.dot_general(o8, out_wq["q"], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        proj = accp.astype(jnp.float32) * ((a / 127.0) * out_wq["scale"]) \
            + out_b
        return (x.astype(jnp.float32) + proj).astype(x.dtype)

    try:
        IB.attn_sublayer_int8 = no_headloop
        row("no_headloop", devtime(tower, bb_q, pixels))
    finally:
        IB.attn_sublayer_int8 = real

    row("no_tome_exact", devtime(lambda bb, px: tower(bb, px, 0),
                                 bb_q, pixels))

    # ---- merge steps alone
    def merges(px):
        x = jnp.tile(px.reshape(B, -1), (1, 2))[:, :S0 * w] \
            .reshape(B, S0, w).astype(jnp.bfloat16)
        sizes = jnp.ones((B, S0), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        for r in sched:
            if r:
                x, sizes = merge_step(x, sizes, r)
                acc = acc + jnp.sum(x[:, 0, 0]).astype(jnp.float32) * 1e-30
        return acc
    row("merge_steps_only", devtime(merges, pixels))

    # ---- embed + MAP head only
    def embed_head(bb, px):
        norm = ((px - 0.5) / 0.5).astype(DEFAULT_POLICY.compute_dtype)
        x = S.patch_embed(norm, bb["embed"]["kernel"],
                          bb["embed"]["bias"], cfg.patch_size)
        x = x + bb["embed"]["pos"].astype(x.dtype)
        pooled = S.map_head(x[:, :FLOOR], backbone["head"], cfg,
                            DEFAULT_POLICY)
        return apply_binary_head(head, pooled)
    row("embed_head_only", devtime(embed_head, bb_q, pixels))


if __name__ == "__main__":
    main()
