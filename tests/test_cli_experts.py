"""Expert-stack CLI: one command must produce the reference's deployed
artifact set, loadable back by the inference engine (SURVEY.md §3.5)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("experts")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    for cls in ("REAL", "FAKE"):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for i in range(16):
            base = 0.5 + 0.2 * np.sin(3 * yy + 4 * xx)[..., None]
            if cls == "FAKE":
                tex = 0.18 * np.sign(np.sin(xx * np.pi * 32))[..., None]
            else:
                tex = 0.05 * rng.standard_normal((64, 64, 1))
            arr = np.clip(base + tex, 0, 1) * np.ones((1, 1, 3))
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                d / f"{i}.png")
    return str(root)


def test_experts_cli_produces_loadable_artifacts(dataset, tmp_path):
    from tpudf.cli.train_experts import main

    save = str(tmp_path / "artifacts")
    summary = main(["--data_dir", dataset, "--save_dir", save,
                    "--model_size", "test-64", "--freq_epochs", "200",
                    "--fusion_steps", "60", "--batch_size", "8",
                    "--v5", "--seed", "0"])
    for f in ("freq_mlp.safetensors", "fusion_head.safetensors",
              "coral_cutpoints.json", "coral_temp.json", "coral_bins.npy",
              "freq_mlp_v5.safetensors", "experts_summary.json"):
        assert os.path.exists(os.path.join(save, f)), f
    assert summary["freq_auc"] > 0.6          # texture task is separable

    # the artifacts must round-trip through the serving loaders
    from tpudf.calib.coral import CoralCutpoints
    from tpudf.models.freq_mlp import (freq_mlp_from_safetensors,
                                       freq_mlp_v5_from_safetensors)
    from tpudf.models.fusion import fusion_linear_from_safetensors
    freq = freq_mlp_from_safetensors(
        os.path.join(save, "freq_mlp.safetensors"))
    assert freq["fc1"]["w"].shape == (24, 64)
    v5 = freq_mlp_v5_from_safetensors(
        os.path.join(save, "freq_mlp_v5.safetensors"))
    assert len(v5["blocks"]) == 2
    fusion = fusion_linear_from_safetensors(
        os.path.join(save, "fusion_head.safetensors"))
    assert fusion["w"].shape == (2, 1)
    cuts = CoralCutpoints.from_json(
        os.path.join(save, "coral_cutpoints.json"),
        os.path.join(save, "coral_temp.json"))
    assert len(cuts.cuts) == 4

    # and the engine-level artifact path consumes the directory directly
    import argparse
    from tpudf.cli.infer import build_engine
    ns = argparse.Namespace(model_size="test-64", backbone_ckpt=None,
                            head_ckpt=None, artifacts=save, seed=0,
                            int8=False, tome_r=None)
    eng = build_engine(ns)
    out = eng.predict_batch_fast(
        (np.random.default_rng(1).random((2, 64, 64, 3)) * 255
         ).astype(np.uint8))
    assert np.all(np.isfinite(out["p_blend"]))
