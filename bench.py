"""Throughput benchmark — prints ONE JSON line for the driver.

Metric: images/sec/chip for SigLIP-2-base (256px) deepfake-detection
inference — the full fused expert path as deployed: statically-quantized
W8A8 ViT tower (calibrated PTQ, ops/quant.py, running the fused int8
Pallas block kernels) with ToMe token merging at the certified deployed
rate (ops/tome.py DEPLOYED_TOME_R) + v5 binary head + 24-d FFT/SRM
frequency expert + fusion + CORAL — i.e. the batched equivalent of the
reference's per-image detect_core (appv3.py:3214). int8- and ToMe-vs-float
accuracy is validated by end-task AUC-delta tests
(tests/test_train_infer_e2e.py), not just feature cosine.

vs_baseline: ratio against an A100 reference throughput for the same
workload. The reference repo publishes no throughput numbers (BASELINE.md),
so we use A100_BASELINE_IPS = 2000 img/s — a generous estimate for
ViT-B/16 @ 256px inference in bf16 with torch.compile on one A100
(~0.9 TFLOP-effective at ~35 GFLOP/img incl. host preprocessing). The
driver-set target (BASELINE.json) is >=5x this per chip.
"""

import json
import time

import jax

try:  # persistent compile cache: repeat driver runs skip the ~minutes AOT
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

A100_BASELINE_IPS = 2000.0


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    *params, pixels = args
    batch = int(pixels.shape[0])

    # scale batch up for throughput (one chip)
    target_batch = 256
    reps = max(1, target_batch // batch)
    big = jnp.tile(pixels, (reps, 1, 1, 1))
    b = int(big.shape[0])

    jit_fn = jax.jit(fn)
    out = jit_fn(*params, big)
    jax.block_until_ready(out)              # compile

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jit_fn(*params, big)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = b * n_iters / dt
    print(json.dumps({
        "metric": "images/sec/chip (SigLIP-base-256 fused detect_core)",
        "value": round(ips, 1),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
