"""ToMe throughput + fidelity sweep on the int8 tower (real chip).

For r in {0, 32, 48, 64, 80, 96}: images/sec at B=256, and pooled-feature
cosine vs the exact bf16 tower on the same (structured) inputs. Structured inputs
(smooth gradients + texture) rather than uniform noise — ToMe merges by
similarity, and real images have far more mergeable tokens than noise, so
noise is the adversarial case for both speed-irrelevant fidelity and the
schedule's usefulness.
"""

import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]   # repo root + scripts/

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)


def make_images(n, s, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    imgs = []
    for i in range(n):
        a, b, c = rng.uniform(2, 9, 3)
        base = 0.5 + 0.25 * np.sin(a * yy + b * xx)[..., None] \
            * np.cos(c * xx)[..., None]
        tex = 0.08 * rng.standard_normal((s, s, 3)).astype(np.float32)
        imgs.append(np.clip(base + tex, 0, 1))
    return np.stack(imgs).astype(np.float32)


def main():
    cfg = CONFIGS["base-256"]
    key = jax.random.key(0)
    backbone = init_siglip(key, cfg)
    b = 256
    pixels = jnp.asarray(make_images(b, 256))
    norm = (pixels - 0.5) / 0.5

    bb_q = jax.jit(lambda bb, px: quantize_siglip_static(
        bb, calibrate_siglip_act_scales(bb, cfg, px, DEFAULT_POLICY))
    )(backbone, norm[:32])

    ref = jax.jit(lambda bb, x: siglip_forward(
        bb, x, cfg, DEFAULT_POLICY)["pooled"])(backbone, norm)
    ref = np.asarray(ref, np.float32)

    from devtime import devtime

    for r in (0, 32, 48, 64, 80, 96):
        fn = jax.jit(lambda bb, x, r=r: siglip_forward(
            bb, x, cfg, DEFAULT_POLICY, tome_r=r)["pooled"])
        out = fn(bb_q, norm)
        dt = devtime(lambda bb, x, r=r: siglip_forward(
            bb, x, cfg, DEFAULT_POLICY, tome_r=r)["pooled"],
            bb_q, norm, iters=8, reps=3)
        o = np.asarray(out, np.float32)
        cos = np.sum(o * ref, -1) / (
            np.linalg.norm(o, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9)
        print(json.dumps({
            "r": r, "img_s": round(b / dt, 1),
            "cos_mean": round(float(cos.mean()), 5),
            "cos_min": round(float(cos.min()), 5)}))


if __name__ == "__main__":
    main()
