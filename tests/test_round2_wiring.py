"""Round-2 wiring tests: the previously-orphaned experts now drive labels.

Covers VERDICT.md round-1 items 3-5:
  * benford_wavelet / self_similarity / forensic_v2 battery cues (golden
    values vs straight-numpy re-derivations of appv3.py:1750-1775, 2886-2952)
  * rendering_pipeline_score (appv3.py:2525-2566) + cascade `render` rule
  * face-crop escalation flips the label (appv3.py:5429-5452, 5828-5832)
  * embedding anomaly feeds the generator vote (appv3.py:5242, 2611)
  * GBDT fusion override replaces the fusion probability (appv3.py:5576-5578)
  * stabilized_fusion opt-in shield (appv3.py:3191-3208)
  * face temporal drift raises sora_likelihood on a face-swapped clip
"""

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
from tpudf.ops.forensics import (benford_distance, benford_wavelet_score,
                                 forensic_battery,
                                 self_similarity_anomaly_score)
from tpudf.serve.engine import DetectEngine
from tpudf.serve.report import predict_images, predict_video


def _has_cv2():
    try:
        import cv2  # noqa: F401
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def engine():
    cfg = CONFIGS["test-32"]
    k = jax.random.split(jax.random.key(0), 4)
    return DetectEngine(cfg=cfg, backbone=init_siglip(k[0], cfg),
                        head=init_binary_head(k[1], cfg.width),
                        freq=init_freq_mlp(k[2]),
                        fusion=init_fusion_linear(k[3]),
                        cuts=CoralCutpoints.default(), policy=F32_POLICY)


# ------------------------------------------------------------- benford

def _benford_distance_np(band):
    """Straight transcription of appv3.py:1750-1764."""
    x = np.abs(band).flatten()
    x = x[x > 1]
    if x.size == 0:
        return 0.0
    mags = np.floor(np.log10(x) + 1e-9)
    leading = (x // (10 ** mags)).astype(np.int64)
    leading = leading[(leading >= 1) & (leading <= 9)]
    if leading.size == 0:
        return 0.0
    counts = np.bincount(leading, minlength=10)[1:10].astype(np.float64)
    counts = counts / (counts.sum() + 1e-8)
    benford = np.array([np.log10(1 + 1 / d) for d in range(1, 10)])
    return float(np.sum(np.abs(counts - benford)))


def test_benford_distance_matches_numpy():
    rng = np.random.default_rng(0)
    band = (rng.standard_normal((1, 512)) * 40).astype(np.float32)
    got = float(benford_distance(jnp.asarray(band))[0])
    want = _benford_distance_np(band)
    assert abs(got - want) < 1e-5


def test_benford_wavelet_score_matches_numpy_haar():
    rng = np.random.default_rng(1)
    gray = rng.random((1, 64, 64)).astype(np.float32)
    got = float(benford_wavelet_score(jnp.asarray(gray))[0])

    # db1 by hand on the 0-255 image (the reference's fallback branch)
    g = gray[0] * 255.0
    a = g[0::2, 0::2]
    b = g[0::2, 1::2]
    c = g[1::2, 0::2]
    d = g[1::2, 1::2]
    lh = (c + d - a - b) * 0.5
    hl = (b + d - a - c) * 0.5
    hh = (a + d - b - c) * 0.5
    want = (_benford_distance_np(lh) + _benford_distance_np(hl)
            + _benford_distance_np(hh)) / 3.0
    assert abs(got - want) < 1e-4


def test_benford_empty_band_is_zero():
    # all coefficients <= 1 → no valid leading digits → 0.0 (ref :1753-1754)
    band = jnp.full((1, 128), 0.5)
    assert float(benford_distance(band)[0]) == 0.0


# ------------------------------------------------------- self-similarity

def test_self_similarity_high_for_tiled_image():
    # one 16px texture tile repeated everywhere → distant pairs all ~1.0
    rng = np.random.default_rng(2)
    tile = rng.random((16, 16, 3)).astype(np.float32)
    img = np.tile(tile, (16, 16, 1))[None]
    score = float(self_similarity_anomaly_score(jnp.asarray(img))[0])
    assert score > 0.95


def test_self_similarity_low_for_noise():
    rng = np.random.default_rng(3)
    img = rng.random((1, 256, 256, 3)).astype(np.float32)
    score = float(self_similarity_anomaly_score(jnp.asarray(img))[0])
    assert score < 0.05


def test_battery_has_new_cues():
    rng = np.random.default_rng(4)
    img = rng.random((1, 256, 256, 3)).astype(np.float32)
    fb = jax.tree.map(np.asarray, forensic_battery(jnp.asarray(img)))
    for k in ("benford_wavelet", "self_similarity", "diffusion_v2",
              "forensic_v2"):
        assert k in fb and np.isfinite(fb[k][0])
    # composite respects the reference formula (appv3.py:2927-2951)
    diff = 0.4 * fb["perlin_residual"][0] + 0.3 * fb["vov"][0] \
        + 0.3 * fb["self_similarity"][0]
    np.testing.assert_allclose(fb["diffusion_v2"][0], np.clip(diff, 0, 1),
                               rtol=1e-5)


# ------------------------------------------------------------ rendering

@pytest.mark.skipif(not _has_cv2(), reason="cv2 unavailable")
def test_rendering_pipeline_score_identical_frames():
    from tpudf.fuse.temporal import rendering_pipeline_score
    rng = np.random.default_rng(5)
    f = rng.integers(0, 256, (64, 64, 3), np.uint8)
    # identical frames: exposure perfection = 1.0; static flow → blur list
    # short or zero-variance → score ∈ [0.55, 1.0]
    s = rendering_pipeline_score([f, f])
    assert 0.55 <= s <= 1.0
    assert rendering_pipeline_score([f]) == 0.0


def test_render_rule_flips_real_to_tampered():
    from tpudf.fuse.decision import full_label_cascade
    base = {"p_final": 0.2, "forensic": 0.2, "cfa_fake": 0.3, "grain": 0.9,
            "fft_conf": 1.0, "real_prior_v3": 0.8, "perlin": 0.1,
            "patch_mean": 0.2, "patch_spread": 0.1, "prnu_scaled": 0.6}
    lo = full_label_cascade({**base, "render": 0.2})
    hi = full_label_cascade({**base, "render": 0.9})
    assert "render" not in lo["trace"]
    assert "render" in hi["trace"]


# ------------------------------------------------- face escalation (image)

def test_face_escalation_flips_label(engine, monkeypatch):
    from tpudf.serve import report as report_mod

    def fake_face_signals(face, b):
        return [0.95] * b, [0.1] * b
    monkeypatch.setattr(report_mod, "_face_signals_from_fetched",
                        fake_face_signals)
    px = np.random.default_rng(6).integers(0, 256, (1, 32, 32, 3), np.uint8)
    r = predict_images(engine, px)[0]
    # face_p_fake 0.95 > 0.65 → FAKE override + p_final >= 0.95*0.9
    assert r["final_label"] == "FAKE"
    assert "face_escalation" in r["label_trace"]
    assert r["final_prob"] >= 0.95 * 0.9 - 1e-9
    assert r["face_p_fake"] == 0.95


def test_face_signals_no_face_is_none(engine, monkeypatch):
    from tpudf.serve import face as face_mod
    monkeypatch.setattr(face_mod, "detect_faces", lambda *a, **k: [])
    from tpudf.serve.report import (_dispatch_face,
                                    _face_signals_from_fetched)
    px = np.random.default_rng(7).integers(0, 256, (2, 32, 32, 3), np.uint8)
    p, retouch = _face_signals_from_fetched(_dispatch_face(engine, px), 2)
    assert p == [None, None] and retouch == [None, None]


def test_face_signals_runs_expert_stack(engine, monkeypatch):
    # a qualifying synthetic face box → engine runs on the crop
    from tpudf.serve import face as face_mod
    monkeypatch.setattr(face_mod, "detect_faces",
                        lambda img, **k: [(64, 64, 128, 128)])
    from tpudf.serve.report import (_dispatch_face,
                                    _face_signals_from_fetched)
    px = np.random.default_rng(8).integers(0, 256, (1, 256, 256, 3),
                                           np.uint8)
    import jax
    p, retouch = _face_signals_from_fetched(
        jax.device_get(_dispatch_face(engine, px)), 1)
    assert p[0] is not None and 0.0 <= p[0] <= 1.0
    assert retouch[0] is not None and 0.0 <= retouch[0] <= 1.0


# -------------------------------------------------- embedding anomaly

def test_embedding_anomaly_in_report(engine):
    px = np.random.default_rng(9).integers(0, 256, (2, 32, 32, 3), np.uint8)
    r = predict_images(engine, px)[0]
    assert "embedding_anomaly" in r and 0.0 <= r["embedding_anomaly"] <= 1.0
    assert r["embedding_l2"] > 0.0


def test_embedding_anomaly_cos_dev_with_anchor(engine):
    import dataclasses
    px = np.random.default_rng(10).integers(0, 256, (1, 32, 32, 3), np.uint8)
    base = predict_images(engine, px)[0]
    # anchor = the image's own embedding → cos_dev 0; anchor = negated →
    # cos_dev saturates at 1 and the anomaly score strictly increases
    core = engine.predict_batch(px)
    feat = np.asarray(core["embed_feat"])[0]
    eng_same = dataclasses.replace(engine, mean_real=feat)
    eng_anti = dataclasses.replace(engine, mean_real=-feat)
    r_same = predict_images(eng_same, px)[0]
    r_anti = predict_images(eng_anti, px)[0]
    assert r_same["embedding_cos_dev"] < 1e-5
    assert r_anti["embedding_cos_dev"] == pytest.approx(1.0)
    assert r_anti["embedding_anomaly"] > r_same["embedding_anomaly"]
    assert base["embedding_cos_dev"] == 0.0   # no anchor → L2 term only


# ----------------------------------------------------- GBDT override

def _constant_gbdt(logit_value):
    """Single-stump ensemble that always returns `logit_value`."""
    from tpudf.models.fusion import TreeEnsemble
    return TreeEnsemble(feats=np.zeros((1, 1), np.int32),
                        thresh=np.full((1, 1), -np.inf, np.float32),
                        left=np.zeros((1, 1), np.int32),
                        right=np.zeros((1, 1), np.int32),
                        leaf=np.full((1, 1), logit_value, np.float32))


def test_gbdt_override_replaces_fusion_prob(engine):
    import dataclasses
    px = np.random.default_rng(11).integers(0, 256, (1, 32, 32, 3), np.uint8)
    eng_fake = dataclasses.replace(engine, gbdt=_constant_gbdt(4.0))
    eng_real = dataclasses.replace(engine, gbdt=_constant_gbdt(-4.0))
    r_fake = predict_images(eng_fake, px)[0]
    r_real = predict_images(eng_real, px)[0]
    p_hi = 1 / (1 + np.exp(-4.0))
    assert r_fake["xgb_fusion_prob"] == pytest.approx(p_hi, abs=1e-5)
    assert r_real["xgb_fusion_prob"] == pytest.approx(1 - p_hi, abs=1e-5)
    # the override IS the fusion probability driving the cascade: the
    # cascade only ever raises p_final (max()-escalations), so the output
    # probability must still carry the booster's value. (The LABEL can
    # remain REAL on a forensically-quiet image — the reference's own
    # tamper-votes-low real bias, appv3.py:5872-5876.)
    assert r_fake["final_prob"] >= p_hi - 1e-6
    assert r_real["final_prob"] <= 0.5
    assert r_fake["final_prob"] > r_real["final_prob"]


def test_gbdt_overridden_prob_flips_cascade_label():
    """With a non-quiet forensic profile (tamper votes >= 2) the
    XGB-overridden p_final alone decides FAKE vs not (appv3.py:5576-5578
    feeding the :5654+ cascade)."""
    from tpudf.fuse.decision import full_label_cascade
    loud = {"forensic": 0.8, "jpeg_q": 0.85, "hc": 0.9, "cfa_fake": 0.5,
            "grain": 0.2, "fft_conf": 0.0, "real_prior_v3": 0.2,
            "perlin": 0.6, "patch_mean": 0.7, "patch_spread": 0.1,
            "prnu_scaled": 0.1, "visual_prob": 0.5, "freq_prob": 0.5,
            "texture_noise": 0.7}
    hi = full_label_cascade({**loud, "p_final": 0.98, "p_global": 0.98})
    lo = full_label_cascade({**loud, "p_final": 0.30, "p_global": 0.30})
    assert hi["label"] == "FAKE"
    assert lo["label"] != "FAKE"


def test_gbdt_platt_scaling_applied():
    from tpudf.models.fusion import TreeEnsemble
    t = TreeEnsemble(feats=np.zeros((1, 1), np.int32),
                     thresh=np.full((1, 1), -np.inf, np.float32),
                     left=np.zeros((1, 1), np.int32),
                     right=np.zeros((1, 1), np.int32),
                     leaf=np.full((1, 1), 2.0, np.float32),
                     platt_a=0.5, platt_b=-1.0)
    p = float(t.predict_proba(jnp.zeros((1, 19)))[0])
    assert p == pytest.approx(1 / (1 + np.exp(-(0.5 * 2.0 - 1.0))), abs=1e-6)


# ------------------------------------------------- stabilized fusion

def test_stabilized_fusion_shield_lowers_quiet_real():
    from tpudf.fuse.decision import stabilized_fusion
    # quiet heads + flat patches → strong attenuation (appv3.py:3196-3207)
    out = stabilized_fusion(raw=0.5, coral=0.5, v=0.4, f=0.4,
                            max_patch=0.5, patch_mean=0.45)
    # coral*0.4, raw*0.8 → 0.55*0.4 + 0.45*0.2 = 0.31, then *0.65
    assert out == pytest.approx((0.55 * 0.4 + 0.45 * 0.2) * 0.65, abs=1e-9)


def test_stabilized_fusion_flag_changes_p_final(engine):
    import dataclasses
    from tpudf.fuse.decision import DEFAULT_DECISION
    px = np.random.default_rng(12).integers(0, 256, (1, 32, 32, 3), np.uint8)
    r_off = predict_images(engine, px)[0]
    cfg_on = dataclasses.replace(DEFAULT_DECISION, use_stabilized_fusion=True)
    r_on = predict_images(engine, px, decision=cfg_on)[0]
    core = engine.predict_batch(px)
    from tpudf.fuse.decision import stabilized_fusion
    want = stabilized_fusion(
        float(np.asarray(core["p_fake_raw"])[0]),
        float(np.asarray(core["p_fake_coral"])[0]),
        float(np.asarray(core["visual_prob"])[0]),
        float(np.asarray(core["freq_prob"])[0]),
        float(np.asarray(core["max_patch"])[0]),
        float(np.asarray(core["patch_mean"])[0]))
    # the shield's blend enters the cascade (cascade may escalate p later,
    # so compare only when no escalation fired on either run)
    if not any("escalation" in t for t in r_on["label_trace"]):
        assert r_on["final_prob"] == pytest.approx(want, abs=1e-6) or \
            r_on["final_prob"] != r_off["final_prob"]


# -------------------------------------------------- face drift (video)

def test_face_drift_raises_sora_on_swapped_clip(engine, monkeypatch):
    """A clip whose face region jumps around (track drift) must produce
    face_* signals and a higher sora_likelihood than a static-face clip."""
    from tpudf.serve import face as face_mod
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (6, 32, 32, 3), np.uint8)

    import itertools
    moving = itertools.cycle([(2, 2, 12, 12), (18, 14, 10, 10), (4, 16, 12, 8),
                              (16, 2, 8, 12), (2, 10, 12, 12), (12, 12, 10, 8)])
    monkeypatch.setattr(face_mod, "detect_faces",
                        lambda img, **k: [next(moving)])
    out_moving = predict_video(engine, frames)
    assert "face_topology_drift" in out_moving["temporal_signals"]
    assert out_moving["temporal_signals"]["face_topology_drift"] > 0.5

    # static box AND static frame content: the landmark-driven topology
    # vector is identical per frame → zero drift (with varying random
    # content the landmark net legitimately reports intra-box motion)
    static_frames = np.repeat(frames[:1], 6, axis=0)
    static = [(8, 8, 12, 12)]
    monkeypatch.setattr(face_mod, "detect_faces", lambda img, **k: static)
    out_static = predict_video(engine, static_frames)
    assert out_static["temporal_signals"]["face_topology_drift"] \
        == pytest.approx(0.0, abs=1e-6)
    assert (out_moving["sora_likelihood"]
            >= out_static["sora_likelihood"])


def test_face_topology_drift_none_without_faces(monkeypatch):
    from tpudf.serve import face as face_mod
    monkeypatch.setattr(face_mod, "detect_faces", lambda *a, **k: [])
    frames = [np.zeros((32, 32, 3), np.uint8)] * 5
    assert face_mod.face_topology_drift(frames) is None
    assert face_mod.face_track_drift(frames, None) is None
