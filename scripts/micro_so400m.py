"""Per-sublayer device cost of the so400m int8 layer path, measured by
repeating each sublayer L=27 times INSIDE one jit (removes the per-dispatch
host RTT that poisons single-op micro timings through the tunnel)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

B, S, W, HEADS, D, DP, INTER, L = 16, 1024, 1152, 16, 72, 128, 4352, 27
WA = HEADS * DP

def bench(fn, *args, iters=8):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

key = jax.random.key(0)
x = jax.random.normal(key, (B, S, W), jnp.bfloat16)
ln = {"scale": jnp.ones((W,), jnp.float32), "bias": jnp.zeros((W,), jnp.float32)}
qkv_w = {"q": jax.random.randint(key, (W, 3*WA), -127, 127, jnp.int8),
         "scale": jnp.full((3*WA,), 0.01, jnp.float32)}
qkv_b = jnp.zeros((3*WA,), jnp.float32)
out_w = {"q": jax.random.randint(key, (WA, W), -127, 127, jnp.int8),
         "scale": jnp.full((W,), 0.01, jnp.float32)}
out_b = jnp.zeros((W,), jnp.float32)
mlp_q = {"fc1_w": {"q": jax.random.randint(key, (W, INTER), -127, 127, jnp.int8),
                   "scale": jnp.full((INTER,), .01, jnp.float32)},
         "fc1_b": jnp.zeros((INTER,), jnp.float32),
         "fc2_w": {"q": jax.random.randint(key, (INTER, W), -127, 127, jnp.int8),
                   "scale": jnp.full((W,), .01, jnp.float32)},
         "fc2_b": jnp.zeros((W,), jnp.float32)}

from tpudf.ops.int8_block import ln_qkv_int8, attn_out_int8
from tpudf.ops.mlp import mlp_block_fused_int8
from tpudf.ops.attention import attention_qkv

def rep(op, z):
    for _ in range(L):
        z = op(z)
    return z

f1 = jax.jit(lambda x: rep(lambda z: ln_qkv_int8(z, ln, qkv_w, qkv_b, 3.0)[..., :W] * 0.01 + x, x))
print(json.dumps({"op": "ln_qkv x27", "ms_per_layer": round(bench(f1, x)/L, 2)}))
f2 = jax.jit(lambda x: rep(lambda z: attn_out_int8(
    jnp.concatenate([z, z, z], -1)[..., :3*WA] if 3*W >= 3*WA else
    jnp.pad(jnp.concatenate([z, z, z], -1), ((0,0),(0,0),(0,3*WA-3*W))),
    z, out_w, out_b, 3.0, HEADS, DP, D**-0.5), x))
print(json.dumps({"op": "attn_out(incl concat/pad) x27", "ms_per_layer": round(bench(f2, x)/L, 2)}))
f3 = jax.jit(lambda x: rep(lambda z: mlp_block_fused_int8(z, ln, mlp_q, {"fc1": 3.0, "fc2": 3.0}), x))
print(json.dumps({"op": "mlp x27", "ms_per_layer": round(bench(f3, x)/L, 2)}))

mm = 2*B*S*(W*3*WA + WA*W + W*INTER + INTER*W)
attn = 2*B*HEADS*S*S*DP*2
print(json.dumps({"proj_ms_at_394T": round(mm/394e9,2), "attn_ms_at_197T_bf16": round(attn/197e9,2)}))
