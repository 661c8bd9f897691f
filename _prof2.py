import time, jax, jax.numpy as jnp
import tpudf.models.siglip as S
from tpudf.core.precision import DEFAULT_POLICY
cfg = S.CONFIGS["base-256"]
bb = S.init_siglip(jax.random.key(0), cfg)
bb16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bb)
B=256
px = jax.random.uniform(jax.random.key(2), (B,256,256,3))
def timeit(name, f, *a):
    g = jax.jit(f)
    jax.block_until_ready(g(*a))
    n=20; t0=time.perf_counter()
    for _ in range(n): out = g(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
timeit("bf16 params", lambda bb,px: S.siglip_forward(bb, px, cfg, DEFAULT_POLICY)["tokens"], bb16, px)
x0 = jax.random.normal(jax.random.key(1), (B*256, 768), jnp.bfloat16)
Ws = [ (jax.random.normal(jax.random.key(10+i), (768,2304), jnp.bfloat16),
        jax.random.normal(jax.random.key(30+i), (768,768), jnp.bfloat16),
        jax.random.normal(jax.random.key(50+i), (768,3072), jnp.bfloat16),
        jax.random.normal(jax.random.key(70+i), (3072,768), jnp.bfloat16)) for i in range(12)]
def chain(x, Ws):
    for wq, wo, w1, w2 in Ws:
        q = x @ wq
        x = x + q[:, :768] @ wo
        h = jax.nn.gelu(x @ w1, approximate=True)
        x = x + h @ w2
    return x
timeit("matmul chain 12L", chain, x0, Ws)
