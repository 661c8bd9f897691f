"""End-to-end integration: train a head with the CLI, then run batch
inference with the trained checkpoint and verify the reports separate the
classes (the tpudf analogue of the reference's evaluation-as-testing,
SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Visually separable classes: REAL = dark noise, FAKE = bright noise."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    for split, n in (("train", 24), ("val", 16)):
        for cls, lo in (("REAL", 0.0), ("FAKE", 0.55)):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.clip(rng.random((32, 32, 3)) * 0.4 + lo, 0, 1)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    d / f"{i}.png")
    return str(root)


def test_train_then_infer(dataset, tmp_path):
    from tpudf.cli.infer import main as infer_main
    from tpudf.cli.train_binary import main as train_main

    save = str(tmp_path / "run")
    train_main(["--data_dir", dataset, "--save_dir", save,
                "--model_size", "test-32", "--epochs", "6",
                "--batch_size", "16", "--lr", "3e-3", "--warmup_steps", "2",
                "--no_augment", "--seed", "0"])
    ckpt = os.path.join(save, "best")
    assert os.path.exists(ckpt)

    out = str(tmp_path / "reports.jsonl")
    infer_main(["--input", os.path.join(dataset, "val"), "--out", out,
                "--model_size", "test-32", "--batch_size", "16", "--fast",
                "--head_ckpt", ckpt, "--seed", "0"])

    labels, z = [], []
    for line in open(out):
        r = json.loads(line)
        parent = os.path.basename(os.path.dirname(r["path"])).upper()
        labels.append(1.0 if parent == "FAKE" else 0.0)
        # use the raw visual-expert logit: the random freq/fusion stack
        # dilutes final_prob, but the trained head must separate classes
        z.append(r["z_sig"])
    from tpudf.eval.metrics import roc_auc
    auc = roc_auc(labels, z)
    assert auc > 0.8, f"trained-head AUC too low: {auc}"
