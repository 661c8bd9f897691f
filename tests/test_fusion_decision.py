"""Bayesian fusion, video aggregation, decision policy, verdict tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudf.fuse.bayesian import bayesian_fuse_v2, dirichlet_fuse
from tpudf.fuse.decision import (classify_rbr, classify_three_way,
                                 finalize_label_and_risk, real_gate,
                                 tamper_votes, traffic_light_label,
                                 DecisionConfig)
from tpudf.fuse.verdict import decide_verdict, choose_band
from tpudf.fuse.video_agg import aggregate_video_probs, temporal_frame_weights


def _cues(v):
    return {k: jnp.asarray([v]) for k in
            ("visual", "freq", "forensic", "cfa", "jpeg", "prnu", "patch")}


def test_bayesian_fuse_directionality():
    hi = bayesian_fuse_v2(_cues(0.9))
    lo = bayesian_fuse_v2(_cues(0.1))
    assert float(hi["posterior_fake"][0]) > 0.9
    assert float(lo["posterior_fake"][0]) < 0.1
    # all-agreeing cues → high certainty
    assert float(hi["certainty"][0]) > 0.8


def test_bayesian_prnu_real_tilt():
    cues = _cues(0.5)
    base = float(bayesian_fuse_v2(cues)["posterior_fake"][0])
    cues["prnu"] = jnp.asarray([0.2])     # weak PRNU → log(0.5) real tilt
    tilted = bayesian_fuse_v2(cues)
    assert float(tilted["posterior_fake"][0]) < base


def test_bayesian_missing_cues_neutral():
    out = bayesian_fuse_v2({"visual": jnp.asarray([0.5])})
    np.testing.assert_allclose(float(out["posterior_fake"][0]), 0.5, atol=1e-5)


def test_dirichlet_uncertainty_shrinks_with_evidence():
    one = dirichlet_fuse({"visual": jnp.asarray([0.8])})
    many = dirichlet_fuse(_cues(0.8))
    assert float(many["uncertainty"][0]) < float(one["uncertainty"][0])
    assert float(many["posterior_fake"][0]) > 0.5


def test_video_aggregation_topk_and_escalation():
    probs = np.asarray([0.1, 0.1, 0.1, 0.9, 0.95])
    p, label, chosen, m = aggregate_video_probs(probs, topk_frac=0.4)
    assert label == "FAKE"          # max-frame escalation >0.75
    assert chosen in (3, 4)
    probs = np.full(6, 0.1)
    p, label, chosen, m = aggregate_video_probs(probs)
    assert label == "REAL" and p <= 0.2


def test_video_aggregation_weighted_median():
    probs = np.asarray([0.2, 0.3, 0.4, 0.5])
    w = np.asarray([1.0, 1.0, 1.0, 1.0])
    p, label, chosen, m = aggregate_video_probs(probs, agg_mode="median",
                                                weights=w)
    assert 0.2 <= p <= 0.5


def test_temporal_frame_weights_range():
    w = temporal_frame_weights([0.0, 1.0, 2.0])
    assert w.min() >= 0.6 and w.max() <= 1.6001


def test_real_gate_and_tamper_votes():
    assert real_gate(0.2, 0.3, 0.3, 0.3, 0.6, 0.05)
    assert not real_gate(0.5, 0.3, 0.3, 0.3, 0.6, 0.05)
    assert not real_gate(0.2, 0.9, 0.3, 0.3, 0.6, 0.05)
    assert tamper_votes(0.9, 0.9, 0.9) == 3
    assert tamper_votes(0.1, 0.1, 0.1) == 0


def test_classify_rbr_strong_cases():
    assert classify_rbr(0.1, 0.9, 0, 0, 0, 0, 1, 1, 1)[0] == "REAL"
    assert classify_rbr(0.9, 0.1, 0, 0, 0, 0, 1, 1, 1)[0] == "FAKE"
    # 4+ moderate conditions → RBR
    lab, code = classify_rbr(0.5, 0.5, 0.5, 0.5, 0.2, 0.9, 0.1, 0.5, 0.5)
    assert lab == "RBR" and code == 0.5


def test_classify_three_way():
    assert classify_three_way(0.9, 0.1, 0.5, 0.5, 0.5, 0.5, 0, 0.5, 0.5,
                              0.5, 0.5, 0.5) == "FAKE"
    assert classify_three_way(0.2, 0.9, 0.2, 0.1, 0.1, 0.5, 0, 0.5, 0.5,
                              0.5, 0.5, 0.5) == "REAL"
    assert classify_three_way(0.4, 0.4, 0.7, 0.5, 0.2, 0.5, 0, 0.5, 0.5,
                              0.2, 0.2, 0.2) == "TAMPERED"


def test_finalize_label_consistency():
    lab, code, *_ = finalize_label_and_risk("REAL", 0.9, 0.5)
    assert lab == "FAKE" and code == 1.0
    lab, code, *_ = finalize_label_and_risk("FAKE", 0.1, 0.5)
    assert lab == "REAL" and code == 0.0
    lab, code, *_ = finalize_label_and_risk("REAL", 0.6, 0.5)
    assert lab == "TAMPERED" and code == 0.5
    # disable_tampered collapses to binary
    cfg = DecisionConfig(disable_tampered=True)
    lab, *_ = finalize_label_and_risk("REAL", 0.6, 0.5, cfg=cfg)
    assert lab in ("REAL", "FAKE")


def test_traffic_light():
    text, color, band, risk = traffic_light_label("FAKE", 0.9, 0.9)
    assert band == "RED" and risk == "HIGH_FAKE"
    text, color, band, risk = traffic_light_label("REAL", 0.1, 0.1)
    assert band == "GREEN"


def test_choose_band_zones():
    assert choose_band(0.1, 0.9) == ("GREEN", "LEAN_REAL")
    assert choose_band(0.9, 0.9) == ("RED", "LEAN_FAKE")
    assert choose_band(0.9, 0.1) == ("ORANGE", "NEUTRAL")


def test_decide_verdict_paths():
    v = decide_verdict({"final_prob": 0.9, "certainty": 0.9,
                        "visual_head": 0.9, "freq_head": 0.9,
                        "cfa_fake_score": 0.7, "patch_mean": 0.8,
                        "forensic_score": 0.2})
    assert v.label == "SYNTHETIC"
    v = decide_verdict({"final_prob": 0.9, "certainty": 0.9,
                        "forensic_score": 0.95, "patch_mean": 0.8,
                        "visual_head": 0.1, "freq_head": 0.1})
    assert v.label == "EDITED"
    v = decide_verdict({"final_prob": 0.1, "certainty": 0.9})
    assert v.label == "LIKELY_REAL"
    v = decide_verdict({"final_prob": 0.5, "certainty": 0.3})
    assert v.label == "UNCERTAIN"


def test_benign_jpeg_penalty_softens():
    base = decide_verdict({"final_prob": 0.9, "certainty": 0.9,
                           "forensic_score": 0.9})
    soft = decide_verdict({"final_prob": 0.9, "certainty": 0.9,
                           "forensic_score": 0.9, "jpeg": 0.95,
                           "jpeg_q_mismatch_score": 0.95,
                           "saturation_peak_score": 0.9})
    assert soft.prob_fake < base.prob_fake
    assert soft.certainty < base.certainty


def test_bayes_fuse_handles_leading_none_cue():
    """A None first value must not poison the batch-shape derivation —
    None is a valid 'missing cue' that v2 fills with 0.5."""
    import jax.numpy as jnp
    from tpudf.fuse.bayesian import bayesian_fuse_v2, dirichlet_fuse
    out = bayesian_fuse_v2({"visual": None, "freq": jnp.array([0.5, 0.9])})
    assert out["posterior_fake"].shape == (2,)
    # calibrated per-cue probs are returned (verdict consumes 'jpeg')
    assert float(out["calibrated"]["visual"][0]) == pytest.approx(0.5)
    d = dirichlet_fuse({"visual": None, "freq": jnp.array([0.5, 0.9])})
    assert np.all(np.isfinite(np.asarray(d["posterior_fake"])))


def test_dirichlet_skips_missing_cues_like_reference():
    """Absent cues contribute no pseudo-counts (appv3.py:1069-1071), so
    uncertainty is higher with fewer cues; an all-missing dict returns the
    neutral Dirichlet(1,1) instead of NaN."""
    import jax.numpy as jnp
    from tpudf.fuse.bayesian import dirichlet_fuse
    full = dirichlet_fuse({"visual": jnp.array([0.8]),
                           "freq": jnp.array([0.8]),
                           "forensic": jnp.array([0.8])})
    one = dirichlet_fuse({"visual": jnp.array([0.8])})
    assert float(one["uncertainty"][0]) > float(full["uncertainty"][0])
    empty = dirichlet_fuse({"visual": None})
    assert float(np.asarray(empty["posterior_fake"])) == pytest.approx(0.5)
    assert np.isfinite(float(np.asarray(empty["uncertainty"])))


def test_risk_idx_zero_not_coerced():
    """risk_idx 0 (lowest risk) must not be coerced to 2 by a falsy-zero
    `or` default: is_inconclusive requires risk in (1, 2)."""
    from tpudf.fuse.decision import full_label_cascade
    base = {"p_final": 0.5, "p_global": 0.5, "patch_mean": 0.4,
            "entropy": 1.5, "head_delta": 0.2}
    risky = full_label_cascade(dict(base, risk_idx=1))
    lowrisk = full_label_cascade(dict(base, risk_idx=0))
    assert risky["label"] == "INCONCLUSIVE"
    assert lowrisk["label"] != "INCONCLUSIVE"
    assert "inconclusive" not in lowrisk["trace"]
