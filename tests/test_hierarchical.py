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
