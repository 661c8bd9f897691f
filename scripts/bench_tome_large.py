"""ToMe fidelity + throughput at the big geometries (large-384, so400m-512):
pooled-feature cosine of the int8+deployed-ToMe tower vs the exact bf16
full-token tower on structured images (see scripts/bench_tome.py for why
structured, not noise). Timing via scripts/devtime (chained in-jit loop —
naive dispatch loops are untrustworthy through the tunneled chip).
Certifies the README rows for the fused-attention large-geometry path."""
import functools
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench_tome import make_images
from devtime import devtime
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)
from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor


def main():
    for name, b in (("large-384", 32), ("so400m-512", 16)):
        cfg = CONFIGS[name]
        key = jax.random.key(0)
        bb = init_siglip(key, cfg)
        px = jnp.asarray(make_images(b, cfg.image_size))
        norm = ((px - 0.5) / 0.5).astype(jnp.bfloat16)
        scales = calibrate_siglip_act_scales(bb, cfg, norm[:8],
                                             DEFAULT_POLICY)
        bbq = quantize_siglip_static(bb, scales, cfg)
        s_tokens = (cfg.image_size // cfg.patch_size) ** 2
        exact = jax.jit(functools.partial(
            siglip_forward, cfg=cfg, policy=DEFAULT_POLICY))
        ref = np.asarray(exact(bb, norm)["pooled"], np.float32)
        for tag, params, r, fl in (
                ("bf16", bb, 0, 0),
                ("int8", bbq, 0, 0),
                ("int8_tome_deployed", bbq, DEPLOYED_TOME_R,
                 deployed_floor(s_tokens))):
            f = functools.partial(siglip_forward, cfg=cfg,
                                  policy=DEFAULT_POLICY,
                                  tome_r=r, tome_floor=fl)
            dt = devtime(lambda p, x: f(p, x)["pooled"], params, norm,
                         iters=8, reps=3)
            got = np.asarray(jax.jit(f)(params, norm)["pooled"], np.float32)
            num = (ref * got).sum(-1)
            den = (np.linalg.norm(ref, axis=-1)
                   * np.linalg.norm(got, axis=-1) + 1e-9)
            cos = num / den
            print(json.dumps({
                "geom": name, "mode": tag, "tome_r": r, "floor": fl,
                "img_s": round(b / dt, 1),
                "cos_mean": round(float(cos.mean()), 4),
                "cos_min": round(float(cos.min()), 4)}))


if __name__ == "__main__":
    main()
