"""ToMe (r, token-floor) sweep on the int8 tower (real chip).

At any fixed token count the tower runs at its int8-matmul roofline; the
only way further down is fewer token-layers. This sweep is what selected
the deployed schedule (r=64, floor = S/8 = 32 tokens — ops/tome.py).
Projection FLOPs scale with the sum of per-layer token counts, so for
base-256/12-layer:

    r=64  floor=64 : 256+192+128+64*9          = 1152 token-layers
    r=64  floor=32 : 256+192+128+64+32*8       =  896  (-22%, deployed)
    r=96  floor=32 : 256+160+80+40+32*8        =  792  (-31%)
    r=128 floor=32 : 256+128+64+32*9           =  736  (-36%)

This sweep measures real throughput + pooled-feature cosine vs the exact
bf16 tower for those points (structured images — the representative case;
see bench_tome.py for why noise is adversarial). The floor is applied by
overriding ops/tome.merge_schedule's min_tokens, which siglip_forward
calls with S//4 — the override keeps the schedule's own clipping rules.
"""

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
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops import tome
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)

_ORIG_SCHEDULE = tome.merge_schedule


def _floored_schedule(floor):
    @functools.wraps(_ORIG_SCHEDULE)
    def fn(n_tokens, layers, r, min_tokens=64):
        return _ORIG_SCHEDULE(n_tokens, layers, r, min_tokens=floor)
    return fn


def main():
    cfg = CONFIGS["base-256"]
    key = jax.random.key(0)
    backbone = init_siglip(key, cfg)
    b = 256
    norm = (jnp.asarray(make_images(b, 256)) - 0.5) / 0.5

    bb_q = jax.jit(lambda bb, px: quantize_siglip_static(
        bb, calibrate_siglip_act_scales(bb, cfg, px, DEFAULT_POLICY))
    )(backbone, norm[:32])

    ref = jax.jit(lambda bb, x: siglip_forward(
        bb, x, cfg, DEFAULT_POLICY)["pooled"])(backbone, norm)
    ref = np.asarray(ref, np.float32)

    from devtime import devtime

    for r, floor in ((64, 64), (64, 32), (96, 32), (128, 32), (96, 48)):
        tome.merge_schedule = _floored_schedule(floor)
        # siglip_forward imports merge_schedule lazily from the module, so
        # the override takes effect per trace; clear jit caches per point
        try:
            sched = tome.merge_schedule(cfg.grid * cfg.grid, cfg.layers, r)
            fn = lambda bb, x, r=r: siglip_forward(
                bb, x, cfg, DEFAULT_POLICY, tome_r=r)["pooled"]
            out = jax.jit(fn)(bb_q, norm)
            dt = devtime(fn, bb_q, norm, iters=8, reps=3)
            o = np.asarray(out, np.float32)
            cos = np.sum(o * ref, -1) / (
                np.linalg.norm(o, axis=-1)
                * np.linalg.norm(ref, axis=-1) + 1e-9)
            toks = cfg.grid * cfg.grid
            counts, t = [toks], toks      # counts[i] = S while block i runs
            for ri in sched:
                t -= ri
                counts.append(t)
            print(json.dumps({
                "r": r, "floor": floor,
                "token_layers": sum(counts[:cfg.layers]),
                "schedule": counts[:5] + ["..."],
                "img_s": round(b / dt, 1),
                "cos_mean": round(float(cos.mean()), 5),
                "cos_min": round(float(cos.min()), 5)}), flush=True)
        finally:
            tome.merge_schedule = _ORIG_SCHEDULE


if __name__ == "__main__":
    main()
