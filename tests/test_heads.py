"""Head / expert / calibration parity tests.

Where the reference ships trained artifacts (siglip/freq_mlp.safetensors,
siglip/fusion_head.safetensors, coral_cutpoints.json, coral_temp.json) we load
them into the tpudf implementations and check numerics against independently
computed expected values.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.calib.coral import (CoralCutpoints, coral_blend, coral_probs,
                               fit_coral_cutpoints)
from tpudf.models.freq_mlp import (apply_freq_mlp, apply_freq_mlp_v5,
                                   freq_mlp_from_safetensors, init_freq_mlp,
                                   init_freq_mlp_v5)
from tpudf.models.fusion import (apply_adaptive_fusion, apply_fusion_linear,
                                 fusion_linear_from_safetensors,
                                 init_adaptive_fusion)
from tpudf.models.heads import (apply_binary_head, apply_fast_binary_head,
                                apply_video_head, init_binary_head,
                                init_fast_binary_head, init_video_head)

REF = "/root/reference/siglip"
HAS_REF = os.path.isdir(REF)


def test_binary_head_shapes():
    p = init_binary_head(jax.random.key(0), 1024)
    f = jax.random.normal(jax.random.key(1), (4, 1024))
    z = apply_binary_head(p, f)
    assert z.shape == (4,)
    # dropout path
    z2 = apply_binary_head(p, f, rng=jax.random.key(2))
    assert z2.shape == (4,)
    assert not np.allclose(z, z2)


@pytest.mark.parametrize("size", ["tiny", "small", "medium", "large"])
def test_fast_binary_head_sizes(size):
    p = init_fast_binary_head(jax.random.key(0), 768, size)
    f = jax.random.normal(jax.random.key(1), (3, 768))
    z = apply_fast_binary_head(p, f)
    assert z.shape == (3,)
    assert np.isfinite(np.asarray(z)).all()


def test_video_head():
    p = init_video_head(jax.random.key(0), 768)
    f = jax.random.normal(jax.random.key(1), (2, 8, 768))
    z = apply_video_head(p, f)
    assert z.shape == (2,)


@pytest.mark.skipif(not HAS_REF, reason="reference artifacts not mounted")
def test_freq_mlp_matches_reference_artifact():
    """Load the deployed freq_mlp.safetensors and compare against a direct
    numpy evaluation of the documented architecture (SafeLayerNorm → 24→64
    GELU → 64→1, appv3.py:1497-1510)."""
    from safetensors.numpy import load_file
    params = freq_mlp_from_safetensors(f"{REF}/freq_mlp.safetensors")
    sd = load_file(f"{REF}/freq_mlp.safetensors")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 24)).astype(np.float32)

    # independent numpy forward
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    xh = (x - mu) / np.sqrt(var + 1e-5)
    xh = xh * sd["net.0.weight"] + sd["net.0.bias"]
    h = xh @ sd["net.1.weight"].T + sd["net.1.bias"]
    from scipy.stats import norm
    gelu = h * norm.cdf(h)
    expect = (gelu @ sd["net.3.weight"].T + sd["net.3.bias"])[:, 0]

    got = apply_freq_mlp(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference artifacts not mounted")
def test_fusion_linear_matches_reference_artifact():
    from safetensors.numpy import load_file
    params = fusion_linear_from_safetensors(f"{REF}/fusion_head.safetensors")
    sd = load_file(f"{REF}/fusion_head.safetensors")
    p_sig, p_freq = 0.8, 0.3
    expect = (np.array([p_sig, p_freq]) @ sd["fc.weight"].T + sd["fc.bias"])[0]
    got = apply_fusion_linear(params, jnp.asarray(p_sig), jnp.asarray(p_freq))
    np.testing.assert_allclose(float(got), expect, atol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference artifacts not mounted")
def test_coral_reference_cutpoints():
    cuts = CoralCutpoints.from_json(f"{REF}/coral_cutpoints.json",
                                    f"{REF}/coral_temp.json")
    assert abs(cuts.temperature - 0.99562) < 1e-3
    # shipped max-cutpoint is logit(0.9821) ≈ 4.0, so the FAKE band needs z > 4
    out = coral_blend(jnp.asarray([0.0, -3.0, 8.0]), cuts)
    p = np.asarray(out["risk_probs"])
    assert p.shape == (3, 5)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    # strongly real logit → REAL band; strongly fake → FAKE band
    assert np.argmax(p[1]) == 0
    assert np.argmax(p[2]) == 4
    assert float(out["p_blend"][1]) < 0.2 < 0.8 < float(out["p_blend"][2])


def test_coral_probs_sum_and_order():
    cuts = CoralCutpoints.default()
    z = jnp.linspace(-6, 6, 25)
    p = coral_probs(z, cuts)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=1e-5)
    # expected fake-ness monotone in z
    mu = np.asarray(p) @ np.arange(5)
    assert (np.diff(mu) > -1e-6).all()


def test_fit_coral_cutpoints_quantiles():
    z = np.linspace(0, 1, 1000)
    cuts = fit_coral_cutpoints(z)
    np.testing.assert_allclose(cuts, [0.15, 0.35, 0.55, 0.75], atol=2e-3)


def test_adaptive_fusion_convex_weighting():
    p = init_adaptive_fusion(jax.random.key(0))
    zf = jnp.asarray([1.0, -2.0])
    zs = jnp.asarray([3.0, -1.0])
    z = apply_adaptive_fusion(p, zf, zs)
    # weighted combination stays within [min, max] of inputs (temp=1 at init)
    lo = np.minimum(np.asarray(zf), np.asarray(zs))
    hi = np.maximum(np.asarray(zf), np.asarray(zs))
    assert ((np.asarray(z) >= lo - 1e-5) & (np.asarray(z) <= hi + 1e-5)).all()


def test_freq_mlp_v5_forward():
    p = init_freq_mlp_v5(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (7, 24))
    z = apply_freq_mlp_v5(p, x)
    assert z.shape == (7,)
    assert np.isfinite(np.asarray(z)).all()
