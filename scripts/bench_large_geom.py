import json, time, functools
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import calibrate_siglip_act_scales, quantize_siglip_static
from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor

def bench(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

for name, b in (("large-384", 32), ("so400m-512", 16)):
    cfg = CONFIGS[name]
    key = jax.random.key(0)
    bb = init_siglip(key, cfg)
    px = jax.random.uniform(jax.random.key(1), (b, cfg.image_size, cfg.image_size, 3), jnp.float32)
    norm = ((px - 0.5) / 0.5).astype(jnp.bfloat16)
    calib = norm[:8]
    scales = calibrate_siglip_act_scales(bb, cfg, calib, DEFAULT_POLICY)
    bbq = quantize_siglip_static(bb, scales)
    S = (cfg.image_size // cfg.patch_size) ** 2
    fl = deployed_floor(S)
    for tag, params, r, flr in (("int8", bbq, 0, 0),
                                ("int8_tome64", bbq, DEPLOYED_TOME_R, fl)):
        f = jax.jit(functools.partial(siglip_forward, cfg=cfg, policy=DEFAULT_POLICY,
                                      tome_r=r, tome_floor=flr))
        dt = bench(lambda p, x: f(p, x)["pooled"], params, norm)
        print(json.dumps({"geom": name, "mode": tag, "img_s": round(b/dt,1), "ms": round(dt*1e3,2)}))
