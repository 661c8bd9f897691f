"""Measure the full-analysis engine (53 views/img: multicrop + TTA + rot
duals + 4x4 patch grid, serve/engine._detect_batch) on the real chip,
int8 tower, with and without ToMe — the batched equivalent of the
reference's ~28-serial-forward full analysis (appv3.py:5186-5223).

Usage: python scripts/bench_full_analysis.py [B]
"""
import functools
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from devtime import devtime

from tpudf.calib.coral import CoralCutpoints
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.freq_mlp import init_freq_mlp
from tpudf.models.fusion import init_fusion_linear
from tpudf.models.heads import init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)
from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
from tpudf.serve.engine import _detect_batch


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = CONFIGS[sys.argv[2] if len(sys.argv) > 2 else "base-256"]
    ks = jax.random.split(jax.random.key(0), 5)
    backbone = init_siglip(ks[0], cfg)
    head = init_binary_head(ks[1], cfg.width)
    freq = init_freq_mlp(ks[2])
    fusion = init_fusion_linear(ks[3])
    cuts = CoralCutpoints.default()
    s_img = cfg.image_size
    calib = (jax.random.uniform(ks[4], (16, s_img, s_img, 3)) - 0.5) / 0.5
    backbone = jax.jit(lambda bb, px: quantize_siglip_static(
        bb, calibrate_siglip_act_scales(bb, cfg, px, DEFAULT_POLICY), cfg)
    )(backbone, calib)

    pixels = (jax.random.uniform(ks[4], (b, s_img, s_img, 3))
              * 255).astype(jnp.float32)

    floor = deployed_floor(cfg.grid * cfg.grid)
    from tpudf.ops.tome import (DEPLOYED_PATCH_TOME_R, deployed_patch_floor)
    pfloor = deployed_patch_floor(cfg.grid * cfg.grid)
    for name, r, fl, pr, pfl in (
            ("int8_exact", 0, 0, 0, 0),
            ("int8_tome64_f32", DEPLOYED_TOME_R, floor, 0, 0),
            ("int8_tome_patchdeep", DEPLOYED_TOME_R, floor,
             DEPLOYED_PATCH_TOME_R, pfloor)):
        fn = functools.partial(_detect_batch, cfg=cfg, policy=DEFAULT_POLICY,
                               cuts=cuts, tome_r=r, tome_floor=fl,
                               patch_tome_r=pr, patch_tome_floor=pfl)
        dt = devtime(fn, backbone, head, freq, fusion, pixels,
                     iters=4, reps=3)
        print(f"{name:14s} B={b}: {dt*1e3:8.2f} ms  "
              f"{b/dt:7.1f} img/s  {b*53/dt:8.0f} views/s")


if __name__ == "__main__":
    main()
