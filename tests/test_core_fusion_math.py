"""Golden test of the detect_core fusion math (appv3.py:3214-3302) using the
reference's shipped artifacts: multicrop weighting → rot dual-view blend →
FREQ_TEMP scaling → fusion head → CORAL temperature + ordinal blend,
computed by hand in numpy and compared to the engine's `_core_from_views`."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from tpudf.calib.coral import CoralCutpoints
from tpudf.models.fusion import fusion_linear_from_safetensors, init_fusion_linear
from tpudf.serve.engine import FREQ_TEMP, _core_from_views

REF = "/root/reference/siglip"


def _sig(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, np.float64)))


def _hand_detect_core(z_sig_v, z_freq_v, z_rot, weights, fw, fb, cuts, temp):
    z_sig = float((z_sig_v * weights).sum())
    z_freq = float((z_freq_v * weights).sum())
    visual = 0.6 * _sig(z_sig) + 0.4 * _sig(z_rot)
    p_freq = _sig(z_freq / FREQ_TEMP)
    z_fused = float(np.array([visual, p_freq]) @ fw + fb)
    z_scaled = z_fused / max(temp, 1e-3)
    p_raw = _sig(z_scaled)
    g = _sig(z_scaled - np.asarray(cuts))
    p = np.concatenate([[1 - g[0]], g[:-1] - g[1:], [g[-1]]])
    p = p / (p.sum() + 1e-8)
    k = np.arange(5)
    mu = (k * p).sum()
    var = (p * (k - mu) ** 2).sum()
    p_gauss = np.clip(mu / 4 + 0.5 * var, 0, 1)
    return np.clip(0.7 * p_raw + 0.3 * p_gauss, 0, 1), visual, p_freq


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_core_from_views_matches_hand_math():
    fusion = fusion_linear_from_safetensors(f"{REF}/fusion_head.safetensors")
    cuts = CoralCutpoints.from_json(f"{REF}/coral_cutpoints.json",
                                    f"{REF}/coral_temp.json")
    rng = np.random.default_rng(0)
    z_sig_v = rng.standard_normal((1, 9)).astype(np.float32)
    z_freq_v = rng.standard_normal((1, 9)).astype(np.float32)
    z_rot = rng.standard_normal(1).astype(np.float32)
    weights = jnp.asarray([0.20] + [0.10] * 8)

    out = _core_from_views(jnp.asarray(z_sig_v), jnp.asarray(z_freq_v),
                           jnp.asarray(z_rot), weights, fusion, cuts)

    fw = np.asarray(fusion["w"])[:, 0]
    fb = float(np.asarray(fusion["b"])[0])
    expect, vis, p_freq = _hand_detect_core(
        z_sig_v[0], z_freq_v[0], float(z_rot[0]),
        np.asarray(weights), fw, fb, np.asarray(cuts.cuts),
        cuts.temperature)

    np.testing.assert_allclose(float(out["visual_prob"][0]), vis, atol=1e-5)
    np.testing.assert_allclose(float(out["freq_prob"][0]), p_freq, atol=1e-5)
    np.testing.assert_allclose(float(out["p_blend"][0]), expect, atol=1e-5)


def test_core_from_views_random_fusion():
    import jax
    fusion = init_fusion_linear(jax.random.key(0))
    cuts = CoralCutpoints.default()
    z = jnp.zeros((2, 9))
    out = _core_from_views(z, z, jnp.zeros(2), jnp.full((9,), 1 / 9.0),
                           fusion, cuts)
    assert np.isfinite(float(out["p_blend"][0]))
    # identical inputs → identical outputs across batch
    np.testing.assert_allclose(np.asarray(out["p_blend"][0]),
                               np.asarray(out["p_blend"][1]))
