"""Hierarchical Bayesian final-decision tests."""

import numpy as np
import jax.numpy as jnp

from tpudf.fuse.hierarchical import bayes_combine, final_decision


def test_bayes_combine_monotone():
    lo = float(bayes_combine([jnp.asarray(0.2)], [1.0], 0.5))
    hi = float(bayes_combine([jnp.asarray(0.8)], [1.0], 0.5))
    assert lo < 0.5 < hi
    # weight scales the influence
    weak = float(bayes_combine([jnp.asarray(0.8)], [0.2], 0.5))
    assert 0.5 < weak < hi
    # None signals skipped
    same = float(bayes_combine([None, jnp.asarray(0.8)], [9.0, 1.0], 0.5))
    np.testing.assert_allclose(same, hi, atol=1e-6)


def test_final_decision_directionality():
    p_fake, lab = final_decision(
        visual_prob=0.95, freq_prob=0.9, fusion_prob=0.9, coral_prob=0.9,
        forensic_score=0.8, diff_score=0.85, max_patch=0.9, patch_mean=0.8,
        head_delta=0.05, spectral_score=0.8, color_score=0.7,
        cfa_fake_score=0.8, real_prior=0.1)
    assert float(p_fake) > 0.9 and lab == "FAKE"

    p_real, lab = final_decision(
        visual_prob=0.1, freq_prob=0.15, fusion_prob=0.1, coral_prob=0.1,
        forensic_score=0.2, diff_score=0.1, max_patch=0.3, patch_mean=0.2,
        head_delta=0.05, cfa_fake_score=0.2, real_prior=0.9)
    assert float(p_real) < 0.2 and lab == "REAL"


def test_cfa_real_tilt_and_head_damping():
    base = float(final_decision(0.7, 0.7, 0.7, 0.7, 0.6, 0.6, 0.7, 0.6,
                                0.0, cfa_fake_score=0.8)[0])
    tilted = float(final_decision(0.7, 0.7, 0.7, 0.7, 0.6, 0.6, 0.7, 0.6,
                                  0.0, cfa_fake_score=0.2)[0])
    assert tilted < base
    damped = float(final_decision(0.7, 0.3, 0.7, 0.7, 0.6, 0.6, 0.7, 0.6,
                                  0.4, cfa_fake_score=0.8)[0])
    assert damped < base


def test_batched():
    p, lab = final_decision(
        visual_prob=jnp.asarray([0.9, 0.1]), freq_prob=jnp.asarray([0.9, 0.1]),
        fusion_prob=jnp.asarray([0.9, 0.1]), coral_prob=jnp.asarray([0.9, 0.1]),
        forensic_score=jnp.asarray([0.8, 0.2]),
        diff_score=jnp.asarray([0.8, 0.1]),
        max_patch=jnp.asarray([0.9, 0.2]), patch_mean=jnp.asarray([0.8, 0.2]),
        head_delta=jnp.asarray([0.0, 0.0]))
    assert p.shape == (2,)
    assert float(p[0]) > float(p[1])


def test_bayes_calibration_isotonic_and_logistic():
    """Calibration hooks (appv3.py:948-975): isotonic recalibration of a
    systematically-biased cue must move the fused posterior toward labels;
    roundtrips through JSON."""
    import numpy as np
    import jax.numpy as jnp
    from tpudf.fuse.bayesian import (BayesCalibration, bayesian_fuse_v2,
                                     fit_bayes_calibration)

    rng = np.random.default_rng(0)
    n = 400
    y = (rng.random(n) > 0.5).astype(np.float64)
    # 'visual' cue is informative but squashed into [0.45, 0.55] — raw
    # log-odds barely move; isotonic should stretch it
    visual = 0.45 + 0.1 * (0.7 * y + 0.3 * rng.random(n))
    feats = {"visual": visual}
    cal = fit_bayes_calibration(feats, y, mode="isotonic")
    assert "visual" in cal.iso

    fused_raw = bayesian_fuse_v2({"visual": jnp.asarray(visual)})
    fused_cal = bayesian_fuse_v2({"visual": jnp.asarray(visual)},
                                 calibration=cal)
    sep = lambda p: float(np.mean(np.asarray(p)[y == 1])
                          - np.mean(np.asarray(p)[y == 0]))
    assert sep(fused_cal["posterior_fake"]) > sep(fused_raw["posterior_fake"])

    # JSON roundtrip preserves behavior
    cal2 = BayesCalibration.from_json(cal.to_json())
    fused_rt = bayesian_fuse_v2({"visual": jnp.asarray(visual)},
                                calibration=cal2)
    np.testing.assert_allclose(np.asarray(fused_rt["posterior_fake"]),
                               np.asarray(fused_cal["posterior_fake"]),
                               atol=1e-6)

    # logistic mode learns signed weights + exposes logistic_posterior
    call = fit_bayes_calibration(feats, y, mode="logistic")
    fused_lg = bayesian_fuse_v2({"visual": jnp.asarray(visual)},
                                calibration=call)
    assert "logistic_posterior" in fused_lg
    assert sep(fused_lg["logistic_posterior"]) > 0.15


def test_logistic_calibration_accepts_none_cues():
    """None-valued cues count as missing (0.5) in BOTH fit modes — the
    feature-dict contract that _gather and the isotonic branch follow."""
    import numpy as np
    from tpudf.fuse.bayesian import fit_bayes_calibration

    rng = np.random.default_rng(1)
    y = (rng.random(100) > 0.5).astype(np.float64)
    feats = {"visual": 0.3 + 0.4 * y, "freq": None, "forensic": None}
    cal = fit_bayes_calibration(feats, y, mode="logistic")
    w, b = cal.logistic
    assert np.all(np.isfinite(w)) and np.isfinite(b)
    # missing cues are constant 0.5 columns -> their weights stay ~0 and
    # the informative cue dominates
    assert abs(w[0]) > abs(w[1]) and abs(w[0]) > abs(w[2])
    cal_iso = fit_bayes_calibration(feats, y, mode="isotonic")
    assert "freq" not in cal_iso.iso
