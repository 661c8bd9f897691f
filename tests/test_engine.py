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
