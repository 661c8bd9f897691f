"""Temporal signal battery tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpudf.fuse.temporal import (aggregate_sora, background_inconsistency,
                                 color_drift, compute_temporal_signals,
                                 edge_flicker, host_flow_signals,
                                 identity_drift_from_embeddings,
                                 jpeg_block_drift, spectral_drift,
                                 texture_flicker)


def _static_video(t=5, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((64, 64, 3)).astype(np.float32)
    frames = np.stack([
        np.clip(base + noise * rng.normal(0, 1, base.shape), 0, 1)
        for _ in range(t)])
    return jnp.asarray(frames, jnp.float32)


def test_identity_drift():
    stable = np.tile(np.ones(16) / 4.0, (5, 1))
    rng = np.random.default_rng(0)
    drifting = rng.normal(0, 1, (5, 16))
    drifting /= np.linalg.norm(drifting, axis=1, keepdims=True)
    lo = float(identity_drift_from_embeddings(jnp.asarray(stable)))
    hi = float(identity_drift_from_embeddings(jnp.asarray(drifting)))
    assert hi > lo and lo == 0.0


def test_temporal_signals_static_vs_noisy():
    static = _static_video(noise=0.0)
    noisy = _static_video(noise=0.25, seed=1)
    s0 = {k: float(v) for k, v in compute_temporal_signals(static).items()}
    s1 = {k: float(v) for k, v in compute_temporal_signals(noisy).items()}
    for k, v in s0.items():
        if k == "parallax_err":
            continue   # NaN on static scenes by design (mean-magnitude
        assert np.isfinite(v), k   # gate, appv3.py parallax family)
    # frame-independent noise → incoherent residual/PRNU vs static clip
    assert s1["prnu_drift"] >= s0["prnu_drift"]
    assert s1["noise_incoherence"] >= s0["noise_incoherence"]


def test_color_drift_directionality():
    t = 5
    frames = np.stack([np.full((32, 32, 3), 0.2 + 0.15 * i, np.float32)
                       for i in range(t)])
    hi = float(color_drift(jnp.asarray(frames)))
    lo = float(color_drift(_static_video()))
    assert hi > lo


def test_aggregate_sora_weighting_and_flag():
    out = aggregate_sora({"id_drift": 0.9, "prnu_drift": 0.9,
                          "prnu_flat_drift": 0.9, "jpeg_block_drift": 0.8,
                          "texture_flicker": 0.7})
    assert out["sora_likelihood"] > 0.6
    assert out["core_hits"] >= 3
    assert out["sora_flag"]
    quiet = aggregate_sora({"id_drift": 0.05, "prnu_drift": 0.1})
    assert not quiet["sora_flag"]
    assert quiet["sora_likelihood"] < 0.2


def test_aggregate_handles_missing():
    out = aggregate_sora({})
    assert out["sora_likelihood"] == 0.0


def test_host_flow_signals():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    base = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    frames = [np.roll(base, i * 2, axis=1) for i in range(4)]
    out = host_flow_signals(frames)
    assert set(out) <= {"flow_fb_inconsistency", "flow_dir_incoherence",
                        "klt_instability", "affine_inconsistency",
                        "flow_reprojection", "parallax_err",
                        "object_inconsistency"}
    for v in out.values():
        assert 0 <= v <= 1
    assert "flow_reprojection" in out
