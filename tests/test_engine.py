"""Batched detection engine tests (tiny backbone, CPU)."""

import numpy as np
import pytest
import jax

from tpudf.calib.coral import CoralCutpoints
from tpudf.core.precision import F32_POLICY
from tpudf.models.freq_mlp import init_freq_mlp
from tpudf.models.fusion import init_fusion_linear
from tpudf.models.heads import init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip
from tpudf.serve.engine import DetectEngine


@pytest.fixture(scope="module")
def engine():
    cfg = CONFIGS["test-32"]
    k = jax.random.split(jax.random.key(0), 4)
    return DetectEngine(
        cfg=cfg,
        backbone=init_siglip(k[0], cfg),
        head=init_binary_head(k[1], cfg.width),
        freq=init_freq_mlp(k[2]),
        fusion=init_fusion_linear(k[3]),
        cuts=CoralCutpoints.default(),
        policy=F32_POLICY,
    )


def test_predict_batch_shapes(engine):
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
    out = engine.predict_batch(px)
    assert out["p_blend"].shape == (2,)
    assert out["risk_probs"].shape == (2, 5)
    assert out["patch_probs"].shape == (2, 16)
    assert np.all((out["p_blend"] >= 0) & (out["p_blend"] <= 1))
    assert np.all(out["max_patch"] >= out["patch_mean"] - 1e-6)


def test_fast_mode(engine):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (3, 32, 32, 3), np.uint8)
    out = engine.predict_batch_fast(px)
    assert out["p_blend"].shape == (3,)
    assert np.isfinite(out["p_blend"]).all()


def test_deterministic(engine):
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)
    a = engine.predict_batch(px)["p_blend"]
    b = engine.predict_batch(px)["p_blend"]
    np.testing.assert_allclose(a, b)


def test_moe_fallback_full_path(engine):
    """fusion=None → the head-less MoE fallback blend drives p_blend on the
    full multicrop path (deepfake-detector-v2/app.py:1380-1390): verify the
    packed output reproduces the reference formula recomputed from the
    engine's own visual/freq/coral signals."""
    eng = DetectEngine(cfg=engine.cfg, backbone=engine.backbone,
                       head=engine.head, freq=engine.freq, fusion=None,
                       cuts=engine.cuts, policy=engine.policy)
    px = np.random.default_rng(3).integers(0, 256, (2, 32, 32, 3), np.uint8)
    out = eng.predict_batch(px)

    def ref_moe(p_sig, p_freq, p_gauss):   # scalar transcription
        p_or = 1.0 - (1.0 - p_sig) * (1.0 - p_freq)
        alpha = min(0.95, max(0.05, p_sig * (1.0 - p_freq)))
        beta = min(0.95, max(0.05, p_freq * (1.0 - p_sig)))
        p_moe = (alpha * p_sig + beta * p_freq) / (alpha + beta + 1e-6)
        return min(1.0, max(0.0, 0.4 * p_or + 0.35 * p_moe + 0.25 * p_gauss))

    # p_blend is the TTA mean of the main and flipped MoE blends; the main
    # branch alone is not packed, so check against the reconstruction from
    # the main-branch signals only on the fast path (single branch)
    fast = eng.predict_batch_fast(px)
    for i in range(2):
        want = ref_moe(float(fast["visual_prob"][i]),
                       float(fast["freq_prob"][i]),
                       float(fast["p_fake_coral"][i]))
        np.testing.assert_allclose(float(fast["p_blend"][i]), want,
                                   atol=1e-5)
    assert np.all((out["p_blend"] >= 0) & (out["p_blend"] <= 1))
