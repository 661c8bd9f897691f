"""Video sampling + config system tests."""

import numpy as np
import pytest

from tpudf.core.config import AppConfig
from tpudf.data.video import (adaptive_sample_indices, pick_primary_scene,
                              sample_video, scan_video_changes)


def test_scan_and_scene_pick():
    # synthetic "video": 2 scenes with a hard cut at frame 50
    rng = np.random.default_rng(0)
    scene_a = (rng.random((32, 32, 3)) * 80).astype(np.uint8)
    scene_b = (rng.random((32, 32, 3)) * 80 + 170).astype(np.uint8)

    def read(i):
        return scene_a if i < 50 else scene_b

    kept, diffs = scan_video_changes(read, 100, stride=5)
    assert len(kept) == 20
    lo, hi = pick_primary_scene(kept, diffs, cut_thresh=0.3)
    # both scenes are 10 samples; primary scene is one contiguous run
    assert hi - lo <= 50


def test_adaptive_indices_respects_cap_and_gap():
    idxs = list(range(0, 200, 5))
    diffs = np.zeros(len(idxs))
    diffs[10] = 0.9
    diffs[11] = 0.8
    out = adaptive_sample_indices(idxs, diffs, max_samples=8, min_gap=5)
    assert len(out) <= 8
    assert sorted(out) == out


@pytest.mark.skipif(pytest.importorskip("cv2") is None, reason="no cv2")
def test_sample_video_roundtrip(tmp_path):
    import cv2
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    rng = np.random.default_rng(0)
    for i in range(40):
        frame = (rng.random((64, 64, 3)) * 100 + i * 3).astype(np.uint8)
        w.write(frame)
    w.release()
    frames, idxs = sample_video(path, max_samples=6, size=48)
    assert frames is not None
    assert frames.shape[1:] == (48, 48, 3)
    assert len(idxs) == frames.shape[0] <= 6


def test_app_config_env_repair(monkeypatch):
    monkeypatch.setenv("FINAL_FAKE_THRESH", "2.5")      # clipped to 0.99
    monkeypatch.setenv("FINAL_REAL_THRESH", "0.999")    # forces reorder
    monkeypatch.setenv("DETECT_VIDEO_MAX_SAMPLES", "-3")
    cfg = AppConfig.from_env()
    assert cfg.final_fake_thresh <= 0.99
    assert cfg.final_real_thresh < cfg.final_fake_thresh
    assert cfg.video_max_samples >= 1
    assert len(cfg.repairs) >= 2
    dc = cfg.decision_config()
    assert dc.final_fake_thresh == cfg.final_fake_thresh
