"""Video trainer CLI smoke test incl. the --analysis publication suite
(hidf_video_classifier.py:2805-3284 equivalent)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("vids")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls, lo in (("REAL", 0), ("FAKE", 140)):
            d = root / split / cls
            d.mkdir(parents=True)
            n = 4 if split == "train" else 2
            for i in range(n):
                path = str(d / f"{i}.mp4")
                w = cv2.VideoWriter(path,
                                    cv2.VideoWriter_fourcc(*"mp4v"),
                                    10, (32, 32))
                for _ in range(12):
                    frame = rng.integers(lo, lo + 100, (32, 32, 3))
                    w.write(frame.astype(np.uint8))
                w.release()
    return str(root)


def test_train_video_cli_with_analysis(video_dataset, tmp_path):
    from tpudf.cli.train_video import main

    save = str(tmp_path / "run")
    main(["--data_dir", video_dataset, "--save_dir", save,
          "--model_size", "test-32", "--epochs", "3", "--batch_size", "2",
          "--num_frames", "4", "--lr", "1e-3", "--analysis", "--seed", "0"])
    assert os.path.exists(os.path.join(save, "best"))
    assert os.path.exists(os.path.join(save, "learning_vs_memorization.png"))
    assert os.path.exists(os.path.join(save, "learning_analysis.json"))
    # the battery must actually see val_loss in history (a missing key
    # silently degenerated the generalization-gap metrics — r3 review)
    import json
    metrics = json.load(open(os.path.join(save, "learning_analysis.json")))
    assert "generalization_gap" in metrics, sorted(metrics)
    figs = os.path.join(save, "figures")
    assert os.path.exists(os.path.join(figs, "roc_curve.png"))
    assert os.path.exists(os.path.join(figs, "confusion_matrix.png"))


def test_train_video_cli_int8_backbone(video_dataset, tmp_path):
    """--int8_backbone smoke for the video trainer."""
    from tpudf.cli.train_video import main
    save = str(tmp_path / "run_q")
    main(["--data_dir", video_dataset, "--save_dir", save,
          "--model_size", "test-32", "--epochs", "1", "--batch_size", "2",
          "--num_frames", "4", "--lr", "1e-3", "--seed", "0",
          "--int8_backbone"])
    assert os.path.exists(os.path.join(save, "best"))
