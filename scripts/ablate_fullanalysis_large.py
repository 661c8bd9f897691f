"""Decompose the large-384 FULL-ANALYSIS gap to the tower floor (r4):
full `_detect_batch` (53 views) vs its components at B=16 —
view construction, tower+head on the prebuilt views, freq battery on the
34 freq views, fusion/packing tail. Identifies whether the ~14% non-tower
overhead has a worthwhile lever.
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
from devtime import devtime

from tpudf.calib.coral import CoralCutpoints
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.data.pipeline import normalize_siglip
from tpudf.models.freq_mlp import apply_freq_mlp, init_freq_mlp
from tpudf.models.fusion import init_fusion_linear
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.fft_features import extract_freq_vector
from tpudf.ops.quant import (calibrate_siglip_act_scales,
                             quantize_siglip_static)
from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
from tpudf.serve.engine import _detect_batch, _freq_gray
from tpudf.serve.engine import PATCH_GRID
from tpudf.data.pipeline import (make_multicrops, make_patch_grid,
                                 rot90_view)

B = 16
cfg = CONFIGS["large-384"]


def main():
    ks = jax.random.split(jax.random.key(0), 5)
    backbone = init_siglip(ks[0], cfg)
    s = cfg.image_size
    calib = (jax.random.uniform(ks[4], (8, s, s, 3)) - 0.5) / 0.5
    backbone = jax.jit(lambda bb, px: quantize_siglip_static(
        bb, calibrate_siglip_act_scales(bb, cfg, px, DEFAULT_POLICY), cfg)
    )(backbone, calib)
    head = init_binary_head(ks[1], cfg.width)
    freq = init_freq_mlp(ks[2])
    fusion = init_fusion_linear(ks[3])
    cuts = CoralCutpoints.default()
    floor = deployed_floor(cfg.grid * cfg.grid)

    pixels = (jax.random.uniform(ks[4], (B, s, s, 3)) * 255)\
        .astype(jnp.float32)

    def build_views(px):
        x = px.astype(jnp.float32) / 255.0
        crops, w = make_multicrops(x)
        flip = jnp.flip(x, axis=2)
        crops_f, _ = make_multicrops(flip)
        patches = make_patch_grid(x, PATCH_GRID)
        views = jnp.concatenate([
            crops, rot90_view(x)[:, None], crops_f,
            rot90_view(flip)[:, None], patches,
            jnp.rot90(patches, k=1, axes=(2, 3)), x[:, None]], axis=1)
        return views.reshape(-1, s, s, 3)

    # rows rebuild views ON DEVICE from the (B,S,S,3) input — shipping a
    # prebuilt (848,384,384,3) views array through the tunnel breaks the
    # remote runtime; subtract the views_only row to isolate components
    # params ride as ARGUMENTS (closure constants embed ~300MB of weights
    # into the serialized HLO and blow the remote-compile payload cap)
    def tower_only(bb, hd, px):
        v = build_views(px)
        feats = siglip_forward(bb, normalize_siglip(v), cfg,
                               DEFAULT_POLICY, tome_r=DEPLOYED_TOME_R,
                               tome_floor=floor)["pooled"]
        return jnp.sum(apply_binary_head(hd, feats))

    def freq_only(fq, px):
        v = build_views(px)[:px.shape[0] * 34]
        return jnp.sum(apply_freq_mlp(
            fq, extract_freq_vector(_freq_gray(v))))

    full = functools.partial(_detect_batch, cfg=cfg, policy=DEFAULT_POLICY,
                             cuts=cuts, tome_r=DEPLOYED_TOME_R,
                             tome_floor=floor)
    rows = [
        ("full53", lambda bb, hd, fq, fu, px: sum(
            jnp.sum(v.astype(jnp.float32)) for v in
            full(bb, hd, fq, fu, px).values()),
         (backbone, head, freq, fusion, pixels)),
        ("views_only", lambda px: jnp.sum(build_views(px)), (pixels,)),
        ("tower53", tower_only, (backbone, head, pixels)),
        ("freq34", freq_only, (freq, pixels)),
    ]
    for name, fn, x in rows:
        # devtime (iters-chained inside one jit) — the slope harness's
        # long chains exceed the remote-compile size cap on this graph
        dt = devtime(fn, *x, iters=4, reps=3)
        print(f"{name:10s} {dt * 1e3:8.2f} ms  ({B / dt:6.1f} img/s)")


if __name__ == "__main__":
    main()
