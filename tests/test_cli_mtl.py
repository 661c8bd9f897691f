"""MTL trainer CLI smoke test on a synthetic local SID-style dataset."""

import csv
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def sid_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("sid")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        img_dir = root / split / "images"
        mask_dir = root / split / "masks"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        rows = []
        for i in range(12):
            label = i % 3
            name = f"{i}.png"
            arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / name)
            if label == 2:
                mask = np.zeros((32, 32), np.uint8)
                mask[8:24, 8:24] = 255
                Image.fromarray(mask).save(mask_dir / name)
            rows.append({"name": name, "label": label})
        with open(root / split / "labels.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["name", "label"])
            w.writeheader()
            w.writerows(rows)
    return str(root)


def test_train_mtl_cli_local(sid_dataset, tmp_path):
    from tpudf.cli.train_mtl import main
    save = str(tmp_path / "run")
    main(["--data_dir", sid_dataset, "--save_dir", save,
          "--model_size", "test-32", "--image_size", "32",
          "--seg_layers", "0", "-1", "--embed_dim", "16",
          "--freeze_below", "1", "--epochs", "2", "--batch_size", "4",
          "--seg_loss", "bce_dice"])
    assert os.path.exists(os.path.join(save, "training_log.csv"))
    import csv as _csv
    rows = list(_csv.DictReader(open(os.path.join(save,
                                                  "training_log.csv"))))
    assert len(rows) >= 1
    assert "val_dice" in rows[0]


def test_train_mtl_cli_int8_frozen(sid_dataset, tmp_path):
    """--int8_frozen smoke: frozen prefix on the W8A8 kernels end to end
    through the CLI (calibration on the first training examples)."""
    from tpudf.cli.train_mtl import main
    save = str(tmp_path / "run_q")
    main(["--data_dir", sid_dataset, "--save_dir", save,
          "--model_size", "test-32", "--image_size", "32",
          "--seg_layers", "0", "-1", "--embed_dim", "16",
          "--freeze_below", "1", "--epochs", "1", "--batch_size", "4",
          "--seg_loss", "bce_dice", "--int8_frozen"])
    assert os.path.exists(os.path.join(save, "training_log.csv"))
