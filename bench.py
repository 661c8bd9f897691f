"""Throughput benchmark — prints ONE JSON line for the driver.

Metric: images/sec/chip for SigLIP-2-base (256px) deepfake-detection
inference — the full fused expert path as deployed: statically-quantized
W8A8 ViT tower (calibrated PTQ, ops/quant.py, running the fused int8
Pallas block kernels) with ToMe token merging at the certified deployed
schedule (ops/tome.py DEPLOYED_TOME_R + deployed_floor, token counts
256→160→80→40→32) + v5 binary head + 24-d FFT/SRM
frequency expert + fusion + CORAL — i.e. the batched equivalent of the
reference's per-image detect_core (appv3.py:3214). int8- and ToMe-vs-float
accuracy is validated by end-task AUC-delta tests
(tests/test_train_infer_e2e.py), not just feature cosine.

Timing methodology (scripts/devtime.py): the dev chip is reached through a
tunnel whose runtime can (a) return from block_until_ready before execution
completes and (b) coalesce repeated identical dispatches — naive timing
loops report numbers that are impossible in both directions (measured: a
4096^3 bf16 matmul "at 7,700 TF/s" on a 197 TF/s chip, and the same graph
2.3x slower in another run). The benchmark therefore chains ITERS forward
passes inside ONE jit via lax.fori_loop with a data-dependent perturbation
(strictly serial, never coalescable), fetches the result bytes, and
subtracts a 1-iteration run so the host<->chip round trip cancels. This is
steady-state device throughput at serving batch size — the number a
non-tunneled production host sees with ordinary async dispatch.

vs_baseline: ratio against an A100 reference throughput for the same
workload. The reference repo publishes no throughput numbers (BASELINE.md),
so we use A100_BASELINE_IPS = 2000 img/s — a generous estimate for
ViT-B/16 @ 256px inference in bf16 with torch.compile on one A100
(~0.9 TFLOP-effective at ~35 GFLOP/img incl. host preprocessing). The
driver-set target (BASELINE.json) is >=5x this per chip.
"""

import json
import os
import sys
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
# B=256 is the measured-optimal serving batch on the v5e: XLA's layout and
# scheduling choices for this graph degrade superlinearly with batch
# (B=256: 23.1 ms, B=512: 49.5, B=1024: ~110 — 11,070 vs 10,200 img/s)
TARGET_BATCH = 256
ITERS = 10
REPS = 5


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from devtime import devtime

    from __graft_entry__ import entry

    fn, args = entry()
    *params, pixels = args
    batch = int(pixels.shape[0])

    reps = max(1, TARGET_BATCH // batch)
    big = jnp.tile(pixels, (reps, 1, 1, 1))
    b = int(big.shape[0])

    dt = devtime(fn, *params, big, iters=ITERS, reps=REPS)

    ips = b / dt
    print(json.dumps({
        "metric": "images/sec/chip (SigLIP-base-256 fused detect_core)",
        "value": round(ips, 1),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
