import os, sys
sys.path[:0] = ["/root/repo", "/root/repo/scripts"]
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np, math
from _slope import slope
B, H, W = 256, 256, 256
rng = np.random.default_rng(0)
phase_np = rng.uniform(-math.pi, math.pi, (B, H*W)).astype(np.float32)
phase = jnp.asarray(phase_np)
nb = 50
bounds = ((np.arange(1, nb) / nb) * (2*math.pi) - math.pi).astype(np.float32)

def ent_f32(p):
    n_ge = jnp.stack([jnp.sum((p >= bk).astype(jnp.float32), axis=1) for bk in bounds], axis=1)
    return n_ge.sum()

def ent_bf16(p):
    p16 = p.astype(jnp.bfloat16)
    n_ge = jnp.stack([jnp.sum((p16 >= jnp.bfloat16(bk)).astype(jnp.float32), axis=1) for bk in bounds], axis=1)
    return n_ge.sum()

def ent_bcast(p):
    # one fused pass: (B, HW, 49) compare summed over HW
    n_ge = jnp.sum((p[:, :, None] >= jnp.asarray(bounds)[None, None, :]).astype(jnp.float32), axis=1)
    return n_ge.sum()

def ent_idx(p):
    # integer binning + 49 equality sums on the small range
    idx = jnp.clip(jnp.floor((p + math.pi) / (2*math.pi/nb)), 0, nb-1).astype(jnp.int32)
    hist = jnp.stack([jnp.sum((idx == k).astype(jnp.float32), axis=1) for k in range(nb)], axis=1)
    return hist.sum()

def ent_matmul(p):
    # one-hot via f32 rounding trick? fallback: bf16 one-hot matmul vs ones — skip
    return ent_bcast(p)

for name, f in [("f32_49sums", ent_f32), ("bf16_49sums", ent_bf16), ("bcast", ent_bcast), ("idx_50sums", ent_idx)]:
    dt = slope(f, phase, lo=4, hi=16, reps=5)
    print(f"{name:12s} {dt*1e3:6.2f} ms/batch")
