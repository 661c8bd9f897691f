"""Training-step throughput on the real TPU chip (VERDICT r1 item 7).

Measures the MTL train step (3-class cls + seg decoder, base-256 backbone,
top blocks unfrozen per Siglip2sidafrozen.py:754-770) and the binary
head train step, in bf16 compute. Prints one JSON line per config.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_train.py
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
import optax


# chained-fori_loop timing (see scripts/devtime.py): naive repeat loops are
# unreliable through the tunneled dev chip (early block_until_ready returns,
# dispatch coalescing)
from devtime import devtime


def main():
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.models.segformer import MTLConfig, init_mtl
    from tpudf.train.mtl import make_mtl_train_step

    cfg = CONFIGS["base-256"]
    b = 64
    rng = np.random.default_rng(0)

    # ---- MTL step, layers >= 9 trainable (ref freezes < 21 of 27; the
    # base tower has 12 layers so the equivalent top-3 stay unfrozen)
    mtl_cfg = MTLConfig(backbone=cfg, seg_layers=(0, 5, 11), embed_dim=256)
    params = init_mtl(jax.random.key(0), mtl_cfg)
    opt = optax.adamw(1e-4)
    from tpudf.train.mtl import quantize_frozen_prefix
    batch = {
        "pixels": jnp.asarray(rng.random((b, 256, 256, 3), np.float32)),
        "cls": jnp.asarray(rng.integers(0, 3, b), jnp.int32),
        "mask": jnp.asarray((rng.random((b, 256, 256)) > 0.5)
                            .astype(np.float32)),
        "has_mask": jnp.asarray((np.arange(b) % 3 == 2)
                                .astype(np.float32)),
    }
    for tag, fq in (("bf16_frozen", None),
                    ("int8_frozen", quantize_frozen_prefix(
                        params, mtl_cfg, batch["pixels"][:16],
                        DEFAULT_POLICY, 9))):
        init_fn, step = make_mtl_train_step(
            mtl_cfg, opt, DEFAULT_POLICY, freeze_below=9,
            seg_loss="bce_dice", frozen_q=fq)
        state = init_fn(params)

        def stepper(s, b, px):
            st, metrics = step(s, {**b, "pixels": px}, jax.random.key(1),
                               1.0, 0.5)
            return metrics
        dt = devtime(stepper, state, batch, batch["pixels"], iters=5,
                     reps=3)
        print(json.dumps({
            "metric": f"mtl_train_step_base256_top3_unfrozen_{tag}",
            "batch": b, "ms": round(dt * 1e3, 1),
            "img_per_s": round(b / dt, 1)}), flush=True)


def main_binary():
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.heads import init_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)
    from tpudf.train.steps import (init_train_state,
                                   make_binary_train_step, make_optimizer)

    cfg = CONFIGS["base-256"]
    b = 256
    rng = np.random.default_rng(0)
    backbone = init_siglip(jax.random.key(0), cfg)
    head = init_binary_head(jax.random.key(1), cfg.width)
    opt = make_optimizer(1e-4, total_steps=1000)
    step = make_binary_train_step(cfg, opt, DEFAULT_POLICY)
    batch = {"pixels": jnp.asarray(rng.random((b, 256, 256, 3), np.float32)),
             "labels": jnp.asarray((np.arange(b) % 2).astype(np.float32))}
    calib = batch["pixels"][:16]
    bbq = quantize_siglip_static(
        backbone, calibrate_siglip_act_scales(backbone, cfg, calib,
                                              DEFAULT_POLICY), cfg)
    from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
    step_t = make_binary_train_step(cfg, opt, DEFAULT_POLICY,
                                    tome_r=DEPLOYED_TOME_R,
                                    tome_floor=deployed_floor(256))
    for tag, bb, st_fn in (("bf16", backbone, step),
                           ("int8", bbq, step),
                           ("int8_tome", bbq, step_t)):
        state = init_train_state(head, opt)

        def stepper(s, bb_, batch_, px):
            st, metrics = st_fn(s, bb_, {**batch_, "pixels": px},
                                jax.random.key(1))
            return metrics
        dt = devtime(stepper, state, bb, batch, batch["pixels"], iters=5,
                     reps=3)
        print(json.dumps({
            "metric": f"binary_head_train_step_base256_{tag}_backbone",
            "batch": b, "ms": round(dt * 1e3, 1),
            "img_per_s": round(b / dt, 1)}), flush=True)


def main_attn_bwd():
    """Pallas fused-QKV attention BACKWARD vs the XLA-recompute VJP on the
    MTL top-3-unfrozen step (r4 verdict next #7 — deploy or park BY
    MEASUREMENT). The flag is read at trace time, so each variant builds
    its own step. Gradient parity: tests/test_attention.py."""
    import os

    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.segformer import MTLConfig, init_mtl
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.train.mtl import make_mtl_train_step

    cfg = CONFIGS["base-256"]
    b = 64
    rng = np.random.default_rng(0)
    mtl_cfg = MTLConfig(backbone=cfg, seg_layers=(0, 5, 11), embed_dim=256)
    params = init_mtl(jax.random.key(0), mtl_cfg)
    opt = optax.adamw(1e-4)
    batch = {
        "pixels": jnp.asarray(rng.random((b, 256, 256, 3), np.float32)),
        "cls": jnp.asarray(rng.integers(0, 3, b), jnp.int32),
        "mask": jnp.asarray((rng.random((b, 256, 256)) > 0.5)
                            .astype(np.float32)),
        "has_mask": jnp.asarray((np.arange(b) % 3 == 2)
                                .astype(np.float32)),
    }
    for tag, flag in (("pallas_bwd", "1"), ("xla_recompute_bwd", "0")):
        os.environ["TPUDF_PALLAS_ATTN_BWD"] = flag
        init_fn, step = make_mtl_train_step(
            mtl_cfg, opt, DEFAULT_POLICY, freeze_below=9,
            seg_loss="bce_dice")
        state = init_fn(params)

        def stepper(s, bch, px):
            st, metrics = step(s, {**bch, "pixels": px}, jax.random.key(1),
                               1.0, 0.5)
            return metrics
        dt = devtime(stepper, state, batch, batch["pixels"], iters=5,
                     reps=3)
        print(json.dumps({
            "metric": f"mtl_train_step_base256_top3_unfrozen_{tag}",
            "batch": b, "ms": round(dt * 1e3, 1),
            "img_per_s": round(b / dt, 1)}), flush=True)
    os.environ.pop("TPUDF_PALLAS_ATTN_BWD", None)


if __name__ == "__main__":
    main()
    main_binary()
    main_attn_bwd()
