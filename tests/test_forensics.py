"""Forensic battery tests: shapes, ranges, directionality, and oracle
parity where the formula is host-computable."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.ops import forensics as F


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    # "real-ish": heavy sensor noise + texture; "fake-ish": smooth gradients
    yy, xx = np.mgrid[0:256, 0:256] / 256.0
    real = np.clip(rng.random((1, 256, 256, 3)) * 0.6
                   + rng.normal(0, 0.08, (1, 256, 256, 3)) + 0.2, 0, 1)
    smooth = np.stack([0.5 + 0.4 * np.sin(2 * np.pi * yy),
                       0.5 + 0.4 * np.cos(2 * np.pi * xx),
                       np.full_like(yy, 0.5)], -1)[None]
    return (jnp.asarray(real, jnp.float32),
            jnp.asarray(smooth, jnp.float32))


def test_battery_shapes_and_ranges(imgs):
    real, fake = imgs
    out = F.forensic_battery(jnp.concatenate([real, fake]))
    assert len(out) >= 30
    for k, v in out.items():
        assert v.shape == (2,), k
        assert np.isfinite(np.asarray(v)).all(), k
        if k not in ("prnu_fft_consistency", "exposure_variation",
                     "prnu_strength"):
            arr = np.asarray(v)
            assert (arr >= -1e-5).all() and (arr <= 1 + 1e-5).all(), k


def test_perlin_directionality(imgs):
    real, fake = imgs
    p_real = float(F.perlin_diffusion_score(real)[0])
    p_fake = float(F.perlin_diffusion_score(fake)[0])
    assert p_fake > p_real     # smooth gradients look diffusion-like


def test_grain_directionality(imgs):
    real, fake = imgs
    assert float(F.grain_likelihood(
        jnp.einsum("bhwc,c->bhw", real, jnp.asarray([.299, .587, .114])))[0]) \
        > float(F.grain_likelihood(
            jnp.einsum("bhwc,c->bhw", fake,
                       jnp.asarray([.299, .587, .114])))[0])


def test_asymmetry_on_mirror():
    rng = np.random.default_rng(1)
    half = rng.random((1, 64, 32, 3)).astype(np.float32)
    mirrored = np.concatenate([half, half[:, :, ::-1]], axis=2)
    a_sym = float(F.asymmetry_score(jnp.asarray(mirrored))[0])
    a_rand = float(F.asymmetry_score(
        jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32)))[0])
    assert a_sym > a_rand      # mirror symmetry → higher fake score


def test_gaussian_blur_matches_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64)).astype(np.float32)
    ours = np.asarray(F.gaussian_blur(jnp.asarray(x), 1.7))[0]
    ref = scipy_nd.gaussian_filter(x[0], 1.7, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_jpeg_residual_oracle():
    from scipy.fft import dct as sdct
    rng = np.random.default_rng(3)
    g = rng.random((1, 32, 32)).astype(np.float32)
    ours = float(F.jpeg_residual_dct(jnp.asarray(g))[0])
    g255 = g[0] * 255.0 - 128.0
    vals = []
    for y in range(0, 32, 8):
        for x in range(0, 32, 8):
            blk = g255[y:y+8, x:x+8]
            d = sdct(sdct(blk.T, norm="ortho").T, norm="ortho")
            vals.append(np.mean(np.abs(d[1:, 1:])))
    oracle = np.clip(np.mean(vals) / 40.0, 0, 1)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_cfa_strength_oracle():
    rng = np.random.default_rng(4)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    ours = float(F.extract_cfa_strength(jnp.asarray(img))[0])
    g = img[0, :, :, 1] * 255.0
    avg = np.abs(g[:, 1:] - g[:, :-1]).mean()
    oracle = np.clip(1.0 - np.clip(avg / 32.0, 0, 1), 0, 1)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_generator_likelihood_vote():
    sig = {k: jnp.asarray([0.9]) for k, _ in F.GEN_WEIGHTS}
    hi = float(F.image_generator_likelihood(sig)[0])
    sig_guarded = dict(sig)
    for k, _ in F.REAL_GUARD_WEIGHTS:
        sig_guarded[k] = jnp.asarray([1.0])
    lo = float(F.image_generator_likelihood(sig_guarded)[0])
    assert hi > lo             # real-guard attenuates
    assert 0 <= lo < hi <= 1


def test_prnu_temporal_incoherence():
    rng = np.random.default_rng(5)
    base_noise = rng.normal(0, 1, (64, 64))
    # correlated sensor pattern across frames → low incoherence
    frames_real = jnp.asarray(np.stack(
        [0.5 + 0.02 * base_noise + 0.002 * rng.normal(0, 1, (64, 64))
         for _ in range(4)]), jnp.float32)
    # independent noise per frame → high incoherence
    frames_fake = jnp.asarray(np.clip(
        0.5 + 0.02 * rng.normal(0, 1, (4, 64, 64)), 0, 1), jnp.float32)
    inc_real = float(F.prnu_temporal_incoherence(frames_real))
    inc_fake = float(F.prnu_temporal_incoherence(frames_fake))
    assert inc_fake > inc_real


def test_real_hard_override():
    out = F.real_hard_override(jnp.asarray([0.1, 0.5]),
                               jnp.asarray([0.9, 0.9]),
                               jnp.asarray([0.001, 0.001]))
    assert bool(out[0]) and not bool(out[1])
