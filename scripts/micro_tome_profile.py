"""Per-stage attribution of ops/tome.merge_step cost (long-chain).

The four deployed merge steps measured ~3.5 ms/256-batch standalone
(vs ~1 ms of estimated matmul+VPU work) and do NOT overlap the block
kernels as the r2 ablation believed. This breaks one S=256 r=64 step into
cumulative stages to find the hot part.

Usage: python scripts/micro_tome_profile.py
"""
import sys
import time

sys.path[:0] = ["/root/repo", "/root/repo/scripts"]

import jax
import jax.numpy as jnp

from _slope import slope  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

B, S, R, W = 256, 256, 64, 768


def stage_fn(stage):
    f32 = jnp.float32
    sp = S - R

    def f(xf):
        x = xf.astype(jnp.bfloat16)
        sizes = jnp.ones((B, S), jnp.bfloat16)
        xn = x.astype(f32)
        xn = xn / (jnp.linalg.norm(xn, axis=-1, keepdims=True) + 1e-6)
        xn = xn.astype(jnp.bfloat16)
        na, nb = xn[:, 0::2], xn[:, 1::2]
        sim = jnp.einsum("bif,bjf->bij", na, nb,
                         preferred_element_type=f32)
        node_max = jnp.max(sim, axis=-1)
        node_idx = jnp.argmax(sim, axis=-1)
        if stage == "sim":
            return node_max + node_idx
        ha = na.shape[1]
        _, top_idx = jax.lax.top_k(node_max, R)
        merged = jnp.sum(jax.nn.one_hot(top_idx, ha, dtype=f32), axis=1) > 0.5
        if stage == "topk":
            return merged.astype(f32) + node_idx
        hb = S - ha
        kept = ~merged
        rank = jnp.cumsum(kept.astype(jnp.int32), axis=-1) - 1
        row_a = jnp.where(merged, node_idx, hb + rank)
        row_b = jnp.broadcast_to(jnp.arange(hb), (B, hb))
        assign = jnp.stack([row_a, row_b], axis=2).reshape(B, S)
        if stage == "assign":
            return assign.astype(f32)
        onehot = (assign[:, :, None] ==
                  jnp.arange(sp)[None, None, :]).astype(x.dtype)
        if stage == "onehot":
            return jnp.sum(onehot, axis=(1, 2))
        num = jnp.einsum("bsp,bsw->bpw", onehot, x * sizes[..., None],
                         preferred_element_type=f32)
        den = jnp.einsum("bsp,bs->bp", onehot, sizes,
                         preferred_element_type=f32)
        return (num / den[..., None]).astype(x.dtype)
    return f


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    x0 = jax.random.normal(jax.random.key(3), (B, S, W), jnp.float32)
    for stage in ("sim", "topk", "assign", "onehot", "full"):
        dt = slope(stage_fn(stage), x0, lo=8, hi=64, reps=5)
        print(f"{stage:7s}: {dt*1e3:7.3f} ms", flush=True)
