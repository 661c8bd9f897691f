"""End-to-end predict pipeline tests (tiny backbone)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def test_report_emits_calibrated_jpeg_for_verdict(engine):
    """The verdict's benign-JPEG penalty reads report['jpeg'] — the
    (possibly isotonic-recalibrated) jpeg cue the reference copies from
    fusion_calibrated into its decision payload (appv3.py:5936-5937,
    consumed at :4412). Without it, benign recompression can never reach
    the 0.80 penalty gate."""
    import numpy as np
    px = np.random.default_rng(7).integers(0, 256, (2, 32, 32, 3), np.uint8)
    reps = predict_images(engine, px, fast=True)
    for r in reps:
        assert "jpeg" in r and 0.0 <= r["jpeg"] <= 1.0
        # uncalibrated engine: the cue is the clipped q-mismatch score
        assert r["jpeg"] == pytest.approx(
            min(max(r["jpeg_q_mismatch_score"], 1e-6), 1 - 1e-6), abs=1e-5)


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


def test_video_temporal_jitted_matches_eager(engine):
    """The packed one-graph video temporal battery (_video_temporal_for)
    must agree with the eager compute_temporal_signals it replaced."""
    from tpudf.fuse.temporal import compute_temporal_signals
    from tpudf.serve.report import _video_temporal_for
    frames = np.random.default_rng(3).integers(0, 256, (4, 32, 32, 3),
                                               np.uint8)
    fn, names = _video_temporal_for(engine, frames, with_embeds=False)
    packed = np.asarray(jax.device_get(fn(engine.backbone,
                                          jnp.asarray(frames))))
    assert len(names) == len(packed)
    x = jax.image.resize(jnp.asarray(frames, jnp.float32) / 255.0,
                         (4, 256, 256, 3), "bilinear")
    eager = compute_temporal_signals(x)
    got = dict(zip(names, packed))
    for k, v in eager.items():
        e = float(v)
        if e != e:  # NaN marks reference-gated signals
            assert got[k] != got[k]
        else:
            np.testing.assert_allclose(got[k], e, rtol=2e-2, atol=2e-3)
    assert "render_regularity" in got and 0.0 <= got["render_regularity"] <= 1


def test_video_report_has_temporal_signals(engine):
    frames = np.random.default_rng(4).integers(0, 256, (4, 32, 32, 3),
                                               np.uint8)
    out = predict_video(engine, frames)
    sigs = out["temporal_signals"]
    for key in ("id_drift", "spectral_drift", "flow_reprojection",
                "render_regularity"):
        assert key in sigs, key
    assert all(v == v for v in sigs.values())  # NaNs filtered out


def test_embed_batch_bucket_padding(engine):
    """embed_batch pads to a pow2 bucket but returns exactly B rows, and
    the rows are identical to the unpadded forward."""
    px = np.random.default_rng(5).integers(0, 256, (3, 32, 32, 3), np.uint8)
    out = engine.embed_batch(px)
    assert out.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-3)
    unpadded = engine.embed_batch(px, pad=False)
    np.testing.assert_allclose(out, unpadded, rtol=1e-4, atol=1e-5)
