"""Full label-cascade golden-case tests (appv3.py:5654-5911 rule order)."""

import pytest

from tpudf.fuse.decision import DecisionConfig, full_label_cascade


def _base(**kw):
    s = {"p_final": 0.5, "p_global": 0.5, "patch_mean": 0.5,
         "patch_spread": 0.1, "head_delta": 0.0, "risk_idx": 2,
         "entropy": 0.5, "forensic": 0.5, "cfa_fake": 0.5, "perlin": 0.5,
         "grain": 0.5, "fft_conf": 0.0, "real_prior_v3": 0.5,
         "jpeg_resid_v3": 0.3, "esrgan": 0.1, "sat_peak": 0.1,
         "jpeg_q": 0.3, "exposure": 0.5, "hc": 0.3, "texture_noise": 0.3,
         "image_gen": 0.1, "prnu_scaled": 0.5, "visual_prob": 0.5,
         "freq_prob": 0.5}
    s.update(kw)
    return s


def test_strong_fake():
    out = full_label_cascade(_base(
        p_final=0.92, forensic=0.8, visual_prob=0.9, freq_prob=0.85,
        cfa_fake=0.9, perlin=0.85, image_gen=0.8, real_prior_v3=0.1,
        patch_mean=0.8, jpeg_q=0.7, hc=0.9, grain=0.1))
    assert out["label"] == "FAKE"
    assert out["code"] == 1.0


def test_strong_real_camera_pipeline():
    out = full_label_cascade(_base(
        p_final=0.1, forensic=0.2, cfa_fake=0.1, grain=0.9,
        real_prior_v3=0.85, perlin=0.1, prnu_scaled=0.7, jpeg_q=0.2,
        hc=0.2, image_gen=0.05, fft_conf=1.0, exposure=0.8))
    assert out["label"] == "REAL"
    assert "cfa_real_override" in out["trace"]


def test_cfa_fake_override():
    out = full_label_cascade(_base(
        p_final=0.8, forensic=0.9, cfa_fake=0.9, visual_prob=0.8,
        perlin=0.9, image_gen=0.8, real_prior_v3=0.1, hc=0.9,
        jpeg_q=0.9, grain=0.1, patch_mean=0.8))
    assert out["label"] == "FAKE"
    assert "cfa_fake_override" in out["trace"]


def test_image_gen_escalation():
    out = full_label_cascade(_base(
        p_final=0.78, image_gen=0.75, forensic=0.7, visual_prob=0.7,
        jpeg_q=0.7, hc=0.9))
    assert out["label"] == "FAKE"
    assert "image_gen_fake" in out["trace"]


def test_image_gen_midprob_demotes_like_reference():
    """At mid p_final the finalize consistency pass re-derives the label from
    thresholds (no override), so image-gen FAKE at p=0.6 does not survive —
    matching appv3.py:4623-4668 + :5890 semantics."""
    out = full_label_cascade(_base(
        p_final=0.6, image_gen=0.75, forensic=0.7, visual_prob=0.7,
        jpeg_q=0.7, hc=0.9))
    assert "image_gen_fake" in out["trace"]
    assert out["label"] in ("REAL", "TAMPERED")


def test_face_escalation():
    out = full_label_cascade(_base(face_p_fake=0.8, jpeg_q=0.7,
                                   forensic=0.75, hc=0.9, visual_prob=0.7))
    assert out["label"] == "FAKE"
    assert out["p_final"] >= 0.72 - 1e-9
    assert "face_escalation" in out["trace"]


def test_tamper_votes_demotion_to_real():
    """With quiet anomaly channels, a TAMPERED lean demotes to REAL
    (appv3.py:5869-5876)."""
    out = full_label_cascade(_base(
        p_final=0.55, forensic=0.3, jpeg_q=0.2, hc=0.2, cfa_fake=0.5,
        grain=0.9, perlin=0.2))
    assert out["label"] in ("REAL", "TAMPERED")
    if out["label"] == "REAL":
        assert out["tamper_votes"] < 2


def test_binary_guard():
    cfg = DecisionConfig(disable_tampered=True, disable_inconclusive=True)
    out = full_label_cascade(_base(p_final=0.6, jpeg_q=0.9, forensic=0.9,
                                   hc=0.9, cfa_fake=0.6), cfg)
    assert out["label"] in ("REAL", "FAKE")


def test_trace_is_ordered_list():
    out = full_label_cascade(_base())
    assert isinstance(out["trace"], list)
