"""Device optical flow (ops/flow.py): analytic ground truth + cv2
cross-checks + signal behavior on synthetic clips."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpudf.ops.flow import (dense_flow, exposure_blur_regularity,
                            flow_signals)


def _texture(h, w, seed=0):
    """Smooth random texture with plenty of gradient information."""
    rng = np.random.default_rng(seed)
    img = rng.random((h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    # mild blur to make it sub-pixel interpolable
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), ax, img)
    return (img * 255.0).astype(np.float32)


def _shift(img, dx, dy):
    """Integer-shift with edge clamp."""
    return np.roll(np.roll(img, dy, axis=0), dx, axis=1)


def test_dense_flow_recovers_translation():
    img = _texture(64, 64)
    shifted = _shift(img, 3, 1)
    u, v = dense_flow(jnp.asarray(img[None]), jnp.asarray(shifted[None]),
                      levels=3)
    # interior pixels (roll wraps the borders)
    ui = np.asarray(u)[0, 12:-12, 12:-12]
    vi = np.asarray(v)[0, 12:-12, 12:-12]
    assert abs(float(np.median(ui)) - 3.0) < 0.5, float(np.median(ui))
    assert abs(float(np.median(vi)) - 1.0) < 0.5, float(np.median(vi))


def test_flow_signals_static_vs_chaotic():
    rng = np.random.default_rng(3)
    img = _texture(64, 64, seed=1)
    static = np.stack([img] * 5) / 255.0

    # chaotic: every frame is an independent texture (decorrelated motion)
    chaos = np.stack([_texture(64, 64, seed=i) for i in range(5)]) / 255.0

    s0 = {k: float(v) for k, v in
          flow_signals(jnp.asarray(static), levels=3).items()}
    s1 = {k: float(v) for k, v in
          flow_signals(jnp.asarray(chaos), levels=3).items()}
    assert s0["flow_fb_inconsistency"] < 0.05
    assert s0["flow_reprojection"] < 0.05
    assert s1["flow_reprojection"] > s0["flow_reprojection"] + 0.1
    # static scene: parallax is undefined (nan), matching the reference's
    # mean-magnitude gate
    assert np.isnan(s0["parallax_err"])


def test_flow_signals_rigid_translation_is_coherent():
    # sliding crops of one big texture = true rigid translation (np.roll
    # would wrap content at the borders — genuinely incoherent motion)
    big = _texture(160, 160, seed=2)
    frames = np.stack([big[i:i + 96, 2 * i:2 * i + 96]
                       for i in range(5)]) / 255.0
    s = {k: float(v) for k, v in
         flow_signals(jnp.asarray(frames), levels=3).items()}
    # uniform translation: coherent direction + low affine outliers
    assert s["flow_dir_incoherence"] < 0.35, s
    assert s["affine_inconsistency"] < 0.35, s


def test_exposure_blur_regularity():
    img = _texture(64, 64, seed=4)
    frames = jnp.asarray(np.stack([img] * 4) / 255.0)
    exposure, blur = exposure_blur_regularity(frames, levels=3)
    # identical frames: perfect exposure continuity + perfectly regular blur
    assert float(exposure) > 0.97
    assert float(blur) > 0.9

    bright = np.stack([img * f for f in (1.0, 0.45, 1.0, 0.45)]) / 255.0
    exposure2, _ = exposure_blur_regularity(
        jnp.asarray(np.clip(bright, 0, 1)), levels=3)
    assert float(exposure2) < float(exposure) - 0.05


def test_signals_against_cv2():
    """Cross-check the device signals against the host-cv2 battery on a
    textured translating clip: both must agree that it is coherent motion
    (not a Sora-style incoherence)."""
    cv2 = pytest.importorskip("cv2")
    big = _texture(192, 192, seed=5)
    frames01 = np.stack([big[2 * i:2 * i + 128, 3 * i:3 * i + 128]
                         for i in range(5)]) / 255.0
    dev = {k: float(v) for k, v in
           flow_signals(jnp.asarray(frames01), levels=4).items()}

    from tpudf.fuse.temporal import host_flow_signals
    frames_u8 = [np.repeat(f[..., None] * 255, 3, -1).astype(np.uint8)
                 for f in frames01]
    host = host_flow_signals(frames_u8)
    for key in ("flow_fb_inconsistency", "flow_dir_incoherence",
                "flow_reprojection"):
        if key in host:
            assert abs(dev[key] - host[key]) < 0.35, (key, dev[key],
                                                      host[key])

def test_parallax_per_pair_gating_matches_host_semantics():
    """parallax_err normalizes and gates PER frame pair (like the host
    battery): on a clip where one pair is near-static and another moves,
    the static pair must not dilute the moving pair's roughness ratio,
    and a clip whose every pair is static stays NaN even if one noisy
    pair would push a pooled global mean over the 0.2 gate."""
    big = _texture(160, 160, seed=7)
    still = big[:96, :96]
    # pair 0: static; pairs 1-2: fast sliding crops (strong motion)
    frames = np.stack([still, still,
                       big[10:106, 20:116], big[20:116, 40:136]]) / 255.0
    s = {k: float(v) for k, v in
         flow_signals(jnp.asarray(frames), levels=3).items()}
    assert np.isfinite(s["parallax_err"])

    # moving-only clip: the per-pair ratio average must match (the static
    # pair is excluded by the per-pair gate, not averaged in)
    moving = np.stack([big[10:106, 20:116], big[20:116, 40:136],
                       big[30:126, 60:156]]) / 255.0
    m = {k: float(v) for k, v in
         flow_signals(jnp.asarray(moving), levels=3).items()}
    # pair set of `moving` == the moving pairs of `frames` plus one more
    # similar slide; the gated averages must be in the same range, NOT
    # diluted toward zero by the static pair
    assert abs(s["parallax_err"] - m["parallax_err"]) < 0.25, (s, m)
