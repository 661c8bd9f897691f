"""Native (libavcodec) video sampler vs the cv2 host path.

cpp/video.cc replaces the reference's cv2 seek-decode sampling
(appv3.py:611-786, hidf_video_classifier.py:106-149); these tests pin
frame-content parity with cv2 decoding at the same indices, scene-aware
pick behavior, and the graceful cv2 fallback."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpudf.data.video import sample_video
from tpudf.data.video_native import available, sample_video_native

pytestmark = pytest.mark.skipif(
    not available(), reason="libtpudf_video.so not built")


def _write_video(path, frames, fps=10):
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    for f in frames:
        vw.write(f[..., ::-1])  # RGB → BGR
    vw.release()


def _smooth_frames(n, seed=0, size=64):
    """Low-frequency frames: codec loss stays small → tight parity bounds."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    out = []
    for i in range(n):
        base = 128 + 80 * np.sin(2 * yy + 0.1 * i) * np.cos(3 * xx)
        f = np.stack([base + rng.uniform(-4, 4)] * 3, -1)
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


@pytest.fixture(scope="module")
def plain_video(tmp_path_factory):
    p = tmp_path_factory.mktemp("vid") / "plain.mp4"
    _write_video(p, _smooth_frames(40))
    return str(p)


@pytest.fixture(scope="module")
def scene_video(tmp_path_factory):
    """Two scenes: 30 bright smooth frames then 90 dark ones — the primary
    (longest) scene is the dark tail."""
    p = tmp_path_factory.mktemp("vid") / "scenes.mp4"
    bright = [np.full((64, 64, 3), 200, np.uint8) for _ in range(30)]
    dark = [np.full((64, 64, 3), 30, np.uint8) for _ in range(90)]
    # add mild texture so the encoder keeps frames distinct
    rng = np.random.default_rng(1)
    frames = [np.clip(f.astype(int) + rng.integers(-3, 4, f.shape), 0, 255)
              .astype(np.uint8) for f in bright + dark]
    _write_video(p, frames)
    return str(p)


def _cv2_frames_at(path, idxs, size):
    cap = cv2.VideoCapture(path)
    out = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, f = cap.read()
        assert ok, f"cv2 could not read frame {i}"
        f = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        out.append(cv2.resize(f, (size, size),
                              interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(out)


def test_uniform_sampling_matches_cv2_content(plain_video):
    frames, idxs = sample_video_native(plain_video, max_samples=8,
                                       size=48, scene_aware=False)
    assert frames is not None and frames.shape == (8, 48, 48, 3)
    assert idxs == sorted(set(idxs)) and idxs[0] == 0 and idxs[-1] == 39
    ref = _cv2_frames_at(plain_video, idxs, 48)
    # same codec/frames; only the resize kernel differs (SWS_AREA vs
    # cv2 INTER_AREA) plus YUV→RGB rounding
    err = np.abs(frames.astype(int) - ref.astype(int)).mean()
    assert err < 6.0, f"native frames diverge from cv2 decode: mean {err}"


def test_scene_aware_picks_primary_scene(scene_video):
    frames, idxs = sample_video_native(scene_video, max_samples=8,
                                       stride=5, size=32, scene_aware=True)
    assert frames is not None and len(idxs) >= 4
    # the longest stable scene is frames 30..119 → picks come from it
    in_dark = [i for i in idxs if i >= 30]
    assert len(in_dark) == len(idxs), f"picks crossed the scene cut: {idxs}"
    assert frames.astype(int).mean() < 90, "picked frames are not dark-scene"


def test_scene_aware_indices_match_host_sampler(scene_video):
    """Same pick logic (primary scene + adaptive indices) as the cv2 host
    path — indices must agree on a clean scene cut."""
    native_frames, native_idx = sample_video_native(
        scene_video, max_samples=8, stride=5, size=32, scene_aware=True)
    os.environ["TPUDF_NO_NATIVE_VIDEO"] = "1"
    try:
        host_frames, host_idx = sample_video(
            scene_video, max_samples=8, stride=5, size=32, scene_aware=True)
    finally:
        del os.environ["TPUDF_NO_NATIVE_VIDEO"]
    assert host_frames is not None
    # both pickers must stay inside the primary scene and overlap heavily
    assert all(i >= 30 for i in host_idx)
    overlap = len(set(native_idx) & set(host_idx))
    assert overlap >= min(len(native_idx), len(host_idx)) - 2, \
        f"native {native_idx} vs host {host_idx}"


def test_sample_video_prefers_native(plain_video, monkeypatch):
    calls = {}
    import tpudf.data.video_native as vn

    real = vn.sample_video_native

    def spy(*a, **k):
        calls["native"] = True
        return real(*a, **k)

    monkeypatch.setattr(vn, "sample_video_native", spy)
    frames, idxs = sample_video(plain_video, max_samples=4, size=32)
    assert calls.get("native") and frames is not None
    assert frames.shape == (4, 32, 32, 3)


def test_bad_file_falls_back(tmp_path):
    bad = tmp_path / "not_a_video.mp4"
    bad.write_bytes(b"definitely not an mp4")
    frames, idxs = sample_video_native(str(bad), max_samples=4, size=32)
    assert frames is None and idxs == []
    # the public entry point degrades like the cv2 path does
    frames, idxs = sample_video(str(bad), max_samples=4, size=32)
    assert frames is None
