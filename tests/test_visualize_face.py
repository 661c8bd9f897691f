"""Visualization + face-plugin tests."""

import numpy as np
import pytest

from tpudf.eval.visualize import (collage, iou_bucket_matrix, mask_overlay,
                                  results_table)
from tpudf.serve.face import detect_faces, face_crop, face_region_retouch_score


def test_mask_overlay_colors():
    img = np.full((8, 8, 3), 128, np.uint8)
    pred = np.zeros((8, 8))
    true = np.zeros((8, 8))
    pred[:4, :4] = 1          # TP region (with true)
    true[:4, :4] = 1
    pred[4:, :4] = 1          # FP
    true[:4, 4:] = 1          # FN
    out = mask_overlay(img, pred, true)
    assert out.shape == img.shape
    # TP greenish, FP reddish, FN bluish
    assert out[0, 0, 1] > out[0, 0, 0]
    assert out[5, 0, 0] > out[5, 0, 1]
    assert out[0, 5, 2] > out[0, 5, 0]


def test_collage_grid():
    imgs = [np.full((10, 10, 3), i * 30, np.uint8) for i in range(6)]
    c = collage(imgs, cols=3)
    assert c.shape[0] > 20 and c.shape[1] > 30


def test_iou_buckets():
    mat, names = iou_bucket_matrix([0.1, 0.3, 0.8, 0.9], [1, 1, 1, 1],
                                   [0, 1, 1, 1])
    assert mat.sum() == 4
    assert mat[0, 0] == 1     # low IoU + wrong class


def test_results_table(tmp_path):
    csv, tex = results_table({"run_a": {"auc": 0.95, "f1": 0.9}},
                             save_dir=str(tmp_path))
    assert "auc" in csv and "\\toprule" in tex
    assert (tmp_path / "results.csv").exists()


def test_face_detection_synthetic():
    cv2 = pytest.importorskip("cv2")
    # haar cascade on random noise: no faces, no crash
    img = (np.random.default_rng(0).random((128, 128, 3)) * 255
           ).astype(np.uint8)
    assert detect_faces(img) == []
    assert face_crop(img) is None


def test_face_retouch_score_range():
    img = (np.random.default_rng(1).random((128, 128, 3)) * 255
           ).astype(np.uint8)
    s = face_region_retouch_score(img)
    assert 0.0 <= s <= 1.0
