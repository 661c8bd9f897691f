"""Deployed-geometry speed-mode certification — CI guard (r4 verdict
weak #3 / next #5).

The real instrument is scripts/cert_geometry.py on the chip (results
recorded in README "Deployed-geometry end-task certification"); this test
keeps that pipeline executable at the TRUE base-256 geometry (12 layers,
256 tokens, width 768 — not the test-64 toy) on CPU at reduced sample
count: procedural 256px data → frozen random-init tower features per
speed mode → head trained on float features → per-mode AUC. The gate is
loose (|ΔAUC| ≤ 0.1) because 24 val samples carry ~0.06 AUC noise — the
tight 0.02/0.03 deltas are asserted by the chip runs (±0.004 measured
over seeds at n_val=384, both amp levels) and at toy geometry by
tests/test_train_infer_e2e.py."""

import os
import sys

import numpy as np
import pytest

_scripts = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
if _scripts not in sys.path:
    sys.path.insert(0, _scripts)


def test_deployed_geometry_speed_mode_auc():
    from cert_geometry import auc_of, extract_features, train_head

    import jax
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.data.pipeline import normalize_siglip
    from tpudf.data.synth_detect import make_detect_batch
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)
    from tpudf.ops.tome import (DEPLOYED_TOME_R, deployed_floor,
                                merge_schedule)

    import jax.numpy as jnp

    cfg = CONFIGS["base-256"]
    n_tok = (cfg.image_size // cfg.patch_size) ** 2
    assert n_tok == 256 and cfg.layers == 12       # real geometry, not toy
    floor = deployed_floor(n_tok)
    sched = merge_schedule(n_tok, cfg.layers, DEPLOYED_TOME_R,
                           min_tokens=floor)
    assert sum(sched) >= n_tok // 2                # cert is not vacuous

    # amped-up artifacts: the CI sample is tiny (20+12 per class on CPU),
    # so the cue must be learnable from few examples; the chip runs probe
    # the subtle-amp regimes
    tr_imgs, tr_y = make_detect_batch(20, cfg.image_size, seed=0,
                                      artifact_amp=0.25)
    va_imgs, va_y = make_detect_batch(12, cfg.image_size, seed=1,
                                      artifact_amp=0.25)

    backbone = init_siglip(jax.random.key(0), cfg)
    calib = jnp.asarray(tr_imgs[::4], jnp.float32) / 255.0
    scales = calibrate_siglip_act_scales(backbone, cfg,
                                         normalize_siglip(calib),
                                         DEFAULT_POLICY)
    backbone_q = quantize_siglip_static(backbone, scales, cfg)

    # two modes: float reference vs the FULL deployed serving config
    # (int8 + deployed ToMe together — the combined gate)
    modes = {
        "float": (backbone, 0, 0),
        "int8+tome": (backbone_q, DEPLOYED_TOME_R, floor),
    }
    feats = {name: {
        "train": extract_features(bb, tr_imgs, cfg, r, fl, chunk=8),
        "val": extract_features(bb, va_imgs, cfg, r, fl, chunk=8),
    } for name, (bb, r, fl) in modes.items()}

    head, _ = train_head(feats["float"]["train"], tr_y, cfg.width,
                         steps=300)
    auc_float = auc_of(head, feats["float"]["val"], va_y)
    assert auc_float > 0.65, f"float head learned nothing: {auc_float}"
    a = auc_of(head, feats["int8+tome"]["val"], va_y)
    assert abs(a - auc_float) <= 0.1, (a, auc_float)
