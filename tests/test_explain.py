"""Explanation layer tests (heuristic fallback; LLM path is env-gated)."""

from tpudf.serve.explain import explain_report, heuristic_explanation


def test_heuristic_fake():
    out = heuristic_explanation({
        "final_label": "FAKE", "final_prob": 0.92,
        "visual_head": 0.9, "freq_head": 0.8, "cfa_fake_score": 0.7,
        "bayesian_fusion_certainty": 0.85})
    assert out["label"] == "FAKE"
    assert "synthetic" in out["summary"] or "manipulated" in out["summary"]
    assert out["confidence"] == "high"
    assert len(out["signals"]) >= 2


def test_heuristic_real():
    out = heuristic_explanation({
        "final_label": "REAL", "final_prob": 0.08,
        "visual_head": 0.1, "cfa_fake_score": 0.1, "forensic_grain": 0.9,
        "bayesian_fusion_certainty": 0.6})
    assert out["label"] == "REAL"
    assert out["confidence"] == "medium"


def test_explain_report_defaults_to_heuristic(monkeypatch):
    monkeypatch.delenv("LLM_API_KEY", raising=False)
    out = explain_report({"final_label": "TAMPERED", "final_prob": 0.55})
    assert out["source"] == "heuristic"
    assert out["label"] == "TAMPERED"
