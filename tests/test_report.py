"""End-to-end predict pipeline tests (tiny backbone)."""

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
from tpudf.serve.report import predict_images, predict_video


@pytest.fixture(scope="module")
def engine():
    cfg = CONFIGS["test-32"]
    k = jax.random.split(jax.random.key(0), 4)
    return DetectEngine(cfg=cfg, backbone=init_siglip(k[0], cfg),
                        head=init_binary_head(k[1], cfg.width),
                        freq=init_freq_mlp(k[2]),
                        fusion=init_fusion_linear(k[3]),
                        cuts=CoralCutpoints.default(), policy=F32_POLICY)


def test_predict_images_report_fields(engine):
    px = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8)
    reports = predict_images(engine, px)
    assert len(reports) == 2
    r = reports[0]
    assert r["final_label"] in ("REAL", "TAMPERED", "FAKE", "INCONCLUSIVE")
    assert 0 <= r["final_prob"] <= 1
    assert len(r["risk_probs"]) == 5
    assert "verdict" in r and r["verdict"]["label"] in (
        "SYNTHETIC", "EDITED", "LIKELY_REAL", "UNCERTAIN")
    assert len(r["patch_probs"]) == 16
    # forensic cues present
    assert sum(k.startswith("forensic_") for k in r) >= 30


def test_predict_video(engine):
    frames = np.random.default_rng(1).integers(0, 256, (5, 32, 32, 3),
                                               np.uint8)
    out = predict_video(engine, frames)
    assert out["video_label"] in ("REAL", "TAMPERED", "FAKE", "INCONCLUSIVE")
    assert len(out["frame_probs"]) == 5
    assert 0 <= out["chosen_frame"] < 5
    assert "chosen_frame_report" in out


def test_report_json_serializable(engine):
    import json
    px = np.random.default_rng(2).integers(0, 256, (1, 32, 32, 3), np.uint8)
    json.dumps(predict_images(engine, px))
