"""CLI smoke tests on synthetic folder datasets (subset-smoke pattern,
SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifake")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls, bias in (("REAL", 0.0), ("FAKE", 0.5)):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(8):
                arr = np.clip(rng.random((32, 32, 3)) * 0.5 + bias, 0, 1)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    d / f"{i}.png")
    return str(root)


def test_train_binary_cli(image_dataset, tmp_path):
    from tpudf.cli.train_binary import main
    save = str(tmp_path / "run")
    main(["--data_dir", image_dataset, "--save_dir", save,
          "--model_size", "test-32", "--epochs", "2", "--batch_size", "8",
          "--warmup_steps", "2", "--no_augment"])
    assert os.path.exists(os.path.join(save, "training_log.csv"))


def test_infer_cli(image_dataset, tmp_path):
    from tpudf.cli.infer import main
    out = str(tmp_path / "reports.jsonl")
    main(["--input", os.path.join(image_dataset, "val"), "--out", out,
          "--model_size", "test-32", "--batch_size", "8", "--fast",
          "--labels_from_dirs"])
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 16
    rep = json.loads(lines[0])
    assert "final_label" in rep and "path" in rep


def test_train_binary_cli_int8_backbone(image_dataset, tmp_path):
    """--int8_backbone smoke: the frozen tower runs the W8A8 path during
    training and eval (calibrated on the first training batch)."""
    from tpudf.cli.train_binary import main
    save = str(tmp_path / "run_q")
    main(["--data_dir", image_dataset, "--save_dir", save,
          "--model_size", "test-32", "--epochs", "1", "--batch_size", "8",
          "--warmup_steps", "2", "--no_augment", "--int8_backbone"])
    assert os.path.exists(os.path.join(save, "training_log.csv"))


def test_train_binary_cli_deployed_features(image_dataset, tmp_path):
    """--int8_backbone --tome_r smoke: the head trains on exactly the
    deployed (int8 + ToMe) serving features."""
    from tpudf.cli.train_binary import main
    save = str(tmp_path / "run_dep")
    main(["--data_dir", image_dataset, "--save_dir", save,
          "--model_size", "test-32", "--epochs", "1", "--batch_size", "8",
          "--warmup_steps", "2", "--no_augment", "--int8_backbone",
          "--tome_r"])
    assert os.path.exists(os.path.join(save, "training_log.csv"))


def test_infer_cli_few_shot_calibrate_invert(image_dataset, tmp_path):
    """S12/S13 inference extras: --invert_logits negates the visual head's
    output logits so every downstream probability/label carries the
    corrected orientation (inference_ai_human_images.py:728), --few_shot
    samples + saves a reproducible support CSV (:544-555) and reports
    adapted metrics, and a second run loads the saved support set;
    --calibrate fits isotonic + temperature on a held split
    (inference_deepfakeface_complete.py:383-478)."""
    from tpudf.cli.infer import main
    out = str(tmp_path / "reports.jsonl")
    sup = str(tmp_path / "support.csv")
    argv = ["--input", os.path.join(image_dataset, "val"), "--out", out,
            "--model_size", "test-32", "--batch_size", "8", "--fast",
            "--labels_from_dirs", "--invert_logits", "--calibrate",
            "--few_shot", "prototype", "--few_shot_n", "4",
            "--support_csv", sup]
    main(argv)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 16
    rep = json.loads(lines[0])
    assert rep["inverted"] is True and 0.0 <= rep["final_prob"] <= 1.0
    sup_rows = open(sup).read().strip().splitlines()
    assert sup_rows[0] == "path,label" and len(sup_rows) == 9  # 4/class
    # second run exercises the load path (support CSV already exists)
    main(argv)
    # orientation check: vs a plain run, the inverted head's visual_prob is
    # exactly 1 - p (sigmoid(-z)) and the label/prob pair stays consistent
    out2 = str(tmp_path / "plain.jsonl")
    main(["--input", os.path.join(image_dataset, "val"), "--out", out2,
          "--model_size", "test-32", "--batch_size", "8", "--fast"])
    plain = [json.loads(x) for x in open(out2).read().strip().splitlines()]
    inv = [json.loads(x) for x in lines]
    for a, b in zip(inv, plain):
        assert abs(a["visual_head"] - (1.0 - b["visual_head"])) < 1e-4
        assert "inverted" not in b


def test_infer_cli_moe_fallback(image_dataset, tmp_path, capsys):
    """No fusion-head artifact and no --random_fusion → the reference's
    MoE fallback blend (deepfake-detector-v2/app.py:534) drives p_blend."""
    from tpudf.cli.infer import main
    out = str(tmp_path / "reports_moe.jsonl")
    main(["--input", os.path.join(image_dataset, "val"), "--out", out,
          "--model_size", "test-32", "--batch_size", "8", "--fast"])
    assert "MoE fallback" in capsys.readouterr().out
    rep = json.loads(open(out).read().strip().splitlines()[0])
    assert 0.0 <= rep["final_prob"] <= 1.0
