"""Perf-breakdown probe for the real TPU chip.

Reports: device kind, tower-only vs freq-expert vs full-pipeline img/s at
several batch sizes, plus the int8-quantized tower. Informs bench.py tuning
(VERDICT r1 item 2: MFU breakdown + path to 5x).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpudf.calib.coral import CoralCutpoints, coral_blend
from tpudf.core.precision import DEFAULT_POLICY
from tpudf.models.freq_mlp import apply_freq_mlp, init_freq_mlp
from tpudf.models.fusion import apply_fusion_linear, init_fusion_linear
from tpudf.models.heads import apply_binary_head, init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.fft_features import extract_freq_vector
from tpudf.ops.quant import quantize_siglip


def bench(fn, args, iters=20, warmup=2, donate=()):
    jit_fn = jax.jit(fn, donate_argnums=donate)
    out = jit_fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = jit_fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jit_fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device_kind": dev.device_kind,
                      "platform": dev.platform,
                      "n": len(jax.devices())}))

    cfg = CONFIGS["base-256"]
    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    backbone = init_siglip(k1, cfg)
    bb_q = quantize_siglip(backbone)
    head = init_binary_head(k2, cfg.width)
    freq = init_freq_mlp(k3)
    fusion = init_fusion_linear(k4)
    cuts = CoralCutpoints.default()

    def tower(bb, pixels):
        norm = (pixels - 0.5) / 0.5
        feats = siglip_forward(bb, norm, cfg, DEFAULT_POLICY)["pooled"]
        return apply_binary_head(head, feats)

    def freq_only(freqp, pixels):
        gray = jnp.einsum("bhwc,c->bhw", pixels,
                          jnp.asarray([0.299, 0.587, 0.114]))
        return apply_freq_mlp(freqp, extract_freq_vector(gray))

    def full(bb, headp, freqp, fus, pixels):
        norm = (pixels - 0.5) / 0.5
        feats = siglip_forward(bb, norm, cfg, DEFAULT_POLICY)["pooled"]
        z_sig = apply_binary_head(headp, feats)
        gray = jnp.einsum("bhwc,c->bhw", pixels,
                          jnp.asarray([0.299, 0.587, 0.114]))
        z_freq = apply_freq_mlp(freqp, extract_freq_vector(gray))
        z = apply_fusion_linear(fus, jax.nn.sigmoid(z_sig),
                                jax.nn.sigmoid(z_freq))
        out = coral_blend(z, cuts)
        return out["p_blend"]

    gflop_img = 48.0  # ViT-B/16 @ 256 tokens fwd (2*85M*256 + attn)
    for b in (256, 512, 1024):
        pixels = jax.random.uniform(k5, (b, 256, 256, 3), jnp.float32)
        rows = {}
        for name, fn, args in (
                ("tower_bf16", tower, (backbone, pixels)),
                ("tower_int8", tower, (bb_q, pixels)),
                ("freq_expert", freq_only, (freq, pixels)),
                ("full_bf16", full, (backbone, head, freq, fusion, pixels)),
                ("full_int8", full, (bb_q, head, freq, fusion, pixels))):
            dt = bench(fn, args)
            ips = b / dt
            rows[name] = {"ips": round(ips, 1),
                          "tflops": round(ips * gflop_img / 1000, 1)}
        print(json.dumps({"batch": b, **rows}))


if __name__ == "__main__":
    main()
