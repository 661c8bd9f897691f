"""Executable rehearsal of the quality-certification runbook.

docs/CERTIFICATION.md §3 prescribes the exact CLI chain that certifies task
quality once real weights/data exist (ref Howtouse.md:74-85,
siglip2siddataset.py:753). This module makes that runbook executable truth
(r3 verdict item 1): it

1. produces REAL-FORMAT artifacts locally — a `SiglipVisionModel`
   checkpoint exactly as §2 prescribes (``save_file(m.state_dict(), ...)``)
   plus the `save_pretrained` directory form, and a reference-layout
   expert-artifact dir (freq_mlp/fusion_head safetensors + coral jsons,
   ref appv3.py:514-554 artifact names);
2. PARSES THE §3 COMMANDS OUT OF THE DOC ITSELF and runs them through the
   real CLI entry points (geometry/epoch scaled down for CPU; every flag
   the doc names is exercised verbatim) — if a CLI flag, artifact format,
   or any wiring in the §3 commands drifts, this file fails;
3. chains (a) train → (b) int8+ToMe infer → metrics JSON → app render fns.

Backbone weights are random-init (zero network egress —
docs/CERTIFICATION.md §0), so assertions are on formats, wiring and
synthetic-data separability, not absolute reference AUC.
"""

import json
import os
import shlex

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------------ doc →
def _cert_commands():
    """Parse the §3 bash block of docs/CERTIFICATION.md into
    [(module, argv), ...]."""
    with open(os.path.join(REPO, "docs", "CERTIFICATION.md")) as f:
        text = f.read()
    sec = text.split("## 3. Certification runs", 1)[1]
    block = sec.split("```bash", 1)[1].split("```", 1)[0]
    block = block.replace("\\\n", " ")
    cmds = []
    for line in block.splitlines():
        line = line.strip()
        if line.startswith("python -m "):
            toks = shlex.split(line)
            cmds.append((toks[2], toks[3:]))
    return cmds


def _find(cmds, module, with_flag=None, without_flag=None):
    for mod, argv in cmds:
        if mod != module:
            continue
        if with_flag and with_flag not in argv:
            continue
        if without_flag and without_flag in argv:
            continue
        return list(argv)
    raise AssertionError(
        f"§3 command not found: {module} with={with_flag} "
        f"without={without_flag} — CERTIFICATION.md drifted")


def _adapt(argv, subst, overrides):
    """Substitute the doc's placeholder paths and scale geometry flags.

    Every flag the doc names stays in argv (drift in the CLI breaks
    parsing); overrides only change values or append extra flags.
    """
    out = []
    for t in argv:
        for old, new in subst.items():
            if old in t:
                t = t.replace(old, new)
        out.append(t)
    for flag, val in overrides.items():
        vals = ([] if val is None else
                [str(v) for v in (val if isinstance(val, (list, tuple))
                                  else [val])])
        if flag in out:
            i = out.index(flag)
            assert len(vals) <= 1, f"cannot replace multi-value {flag}"
            if vals:
                out[i + 1] = vals[0]
        else:
            out.extend([flag] + vals)
    return out


# ------------------------------------------------------------- fixtures
def _save_hf_checkpoint(root, tag, image_size, patch_size):
    """§2 recipe, executed: random-init SiglipVisionModel → both the
    save_pretrained dir and the single-file `save_file(state_dict)` form."""
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=image_size, patch_size=patch_size)
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(hf_cfg).eval()

    pretrained_dir = os.path.join(root, f"pretrained_{tag}")
    model.save_pretrained(pretrained_dir)
    single = os.path.join(root, f"siglip_vision_{tag}.safetensors")
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              single)
    return pretrained_dir, single


@pytest.fixture(scope="module")
def hf_ckpts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hf"))
    d64, f64 = _save_hf_checkpoint(root, "test-64", 64, 8)
    d32, f32 = _save_hf_checkpoint(root, "test-32", 32, 16)
    return {"test-64": f64, "test-64_dir": d64,
            "test-32": f32, "test-32_dir": d32}


def test_both_checkpoint_forms_convert_identically(hf_ckpts):
    """The §2 single-file form and the save_pretrained directory form must
    convert to the same tpudf pytree (conversion keyed on names/shapes)."""
    from safetensors.numpy import load_file
    from tpudf.models.convert import from_hf_state_dict
    from tpudf.models.siglip import CONFIGS

    cfg = CONFIGS["test-64"]
    a = from_hf_state_dict(load_file(hf_ckpts["test-64"]), cfg)
    st = [f for f in os.listdir(hf_ckpts["test-64_dir"])
          if f.endswith(".safetensors")]
    assert st, "save_pretrained produced no safetensors"
    sd = {}
    for f in st:
        sd.update(load_file(os.path.join(hf_ckpts["test-64_dir"], f)))
    b = from_hf_state_dict(sd, cfg)
    import jax
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def artifacts_dir(tmp_path_factory):
    """Reference-layout expert artifacts (appv3.py:514-554 names;
    freq_mlp keys net.0/1/3, fusion fc.{weight,bias}, coral jsons with the
    shipped reference values)."""
    from safetensors.numpy import save_file
    d = str(tmp_path_factory.mktemp("artifacts"))
    rng = np.random.default_rng(3)
    save_file({
        "net.0.weight": np.ones(24, np.float32),
        "net.0.bias": np.zeros(24, np.float32),
        "net.1.weight": (rng.standard_normal((64, 24)) * 0.1)
        .astype(np.float32),
        "net.1.bias": np.zeros(64, np.float32),
        "net.3.weight": (rng.standard_normal((1, 64)) * 0.1)
        .astype(np.float32),
        "net.3.bias": np.zeros(1, np.float32),
    }, os.path.join(d, "freq_mlp.safetensors"))
    # visual-dominant fusion so the trained head drives final probs
    save_file({"fc.weight": np.asarray([[4.0, 0.5]], np.float32),
               "fc.bias": np.asarray([-2.0], np.float32)},
              os.path.join(d, "fusion_head.safetensors"))
    with open(os.path.join(d, "coral_cutpoints.json"), "w") as f:
        json.dump({"q25": 0.2416, "q50": 0.4361, "q75": 0.5118,
                   "max": 0.9821}, f)
    with open(os.path.join(d, "coral_temp.json"), "w") as f:
        json.dump({"temperature": 0.99562}, f)
    return d


def _texture_image(rng, yy, xx, cls):
    a, b = rng.uniform(2, 7, 2)
    base = 0.5 + 0.2 * (np.sin(a * yy + b * xx)[..., None]
                        * np.ones((1, 1, 3)))
    if cls == "FAKE":
        tex = 0.18 * np.sign(np.sin(xx * np.pi * 32)
                             * np.cos(yy * np.pi * 32))[..., None]
    else:
        tex = 0.06 * rng.standard_normal(yy.shape + (3,))
    return np.clip(base + tex, 0, 1)


@pytest.fixture(scope="module")
def cifake_dir(tmp_path_factory):
    """CiFake folder layout (train/val/test × REAL|FAKE), texture-separable
    (same construction test_train_infer_e2e certifies as learnable)."""
    root = tmp_path_factory.mktemp("cifake")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    for split, n in (("train", 24), ("val", 12), ("test", 12)):
        for cls in ("REAL", "FAKE"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = _texture_image(rng, yy, xx, cls)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def sid_dir(tmp_path_factory):
    """Local SID-style layout for the §3(c) trainer."""
    import csv
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
            Image.fromarray((rng.random((32, 32, 3)) * 255)
                            .astype(np.uint8)).save(img_dir / name)
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


@pytest.fixture(scope="module")
def hidf_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("hidf")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls, lo in (("REAL", 0), ("FAKE", 140)):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(4 if split == "train" else 2):
                w = cv2.VideoWriter(str(d / f"{i}.mp4"),
                                    cv2.VideoWriter_fourcc(*"mp4v"),
                                    10, (32, 32))
                for _ in range(12):
                    w.write(rng.integers(lo, lo + 100, (32, 32, 3))
                            .astype(np.uint8))
                w.release()
    return str(root)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("runs"))


def _subst(hf_ckpts, cifake_dir, run_dir, hidf=None):
    return {
        "/data/cifake": cifake_dir,
        "runs/cifake": os.path.join(run_dir, "cifake"),
        "/data/hidf": hidf or "/data/hidf",
        "siglip_vision.safetensors": hf_ckpts["test-64"],
    }


# ------------------------------------------------------------ §3 chain
@pytest.fixture(scope="module")
def trained_a(hf_ckpts, cifake_dir, run_dir):
    """§3(a): train with the real-format backbone ckpt, then the
    --evaluate_only --resume form."""
    from tpudf.cli.train_binary import main
    cmds = _cert_commands()
    sub = _subst(hf_ckpts, cifake_dir, run_dir)

    train = _find(cmds, "tpudf.cli.train_binary",
                  without_flag="--evaluate_only")
    argv = _adapt(train, sub, {
        "--model_size": "test-64", "--epochs": 6, "--batch_size": 16,
        # short-run scaling: EMA must move off init in ~18 steps and the
        # default 100-step warmup would keep lr ~0 for the whole run
        "--ema_decay": 0.9, "--lr": "3e-3", "--warmup_steps": 2,
        "--no_augment": None, "--seed": 0,
    })
    main(argv)
    best = os.path.join(run_dir, "cifake", "best")
    assert os.path.exists(best), "§3(a) produced no best checkpoint"
    assert os.path.exists(os.path.join(run_dir, "cifake",
                                       "training_log.csv"))
    return best


def test_a_evaluate_only(trained_a, hf_ckpts, cifake_dir, run_dir, capsys):
    from tpudf.cli.train_binary import main
    cmds = _cert_commands()
    ev = _find(cmds, "tpudf.cli.train_binary", with_flag="--evaluate_only")
    argv = _adapt(ev, _subst(hf_ckpts, cifake_dir, run_dir),
                  {"--model_size": "test-64", "--batch_size": 16})
    main(argv)
    out = capsys.readouterr().out
    assert "[evaluate_only]" in out and "auc" in out


def test_b_int8_tome_infer_to_report(trained_a, hf_ckpts, cifake_dir,
                                     run_dir, artifacts_dir, tmp_path,
                                     capsys):
    """§3(b): deployed-speed-config inference with the trained head and the
    real-format backbone → metrics JSON → app render fns."""
    from tpudf.cli.infer import main
    cmds = _cert_commands()
    infer = _find(cmds, "tpudf.cli.infer")
    out_path = str(tmp_path / "reports.jsonl")
    argv = _adapt(infer, _subst(hf_ckpts, cifake_dir, run_dir), {
        "--model_size": "test-64", "--batch_size": 16,
        "--out": out_path, "--artifacts": artifacts_dir, "--seed": 0,
    })
    main(argv)
    stdout = capsys.readouterr().out
    assert "MoE fallback" not in stdout, \
        "reference-layout fusion artifact was not picked up"

    reports = [json.loads(x) for x in open(out_path)]
    assert len(reports) == 24
    labels = [1.0 if "FAKE" in os.path.basename(os.path.dirname(r["path"]))
              .upper() else 0.0 for r in reports]
    from tpudf.eval.metrics import roc_auc
    auc = roc_auc(labels, [r["z_sig"] for r in reports])
    assert auc > 0.8, f"int8+ToMe deployed config lost the signal: {auc}"

    # the printed summary is the metrics JSON the runbook records
    start = stdout.rindex("{", 0, stdout.index('"metrics"'))
    summary = json.JSONDecoder().raw_decode(stdout[start:])[0]
    assert "auc" in summary["metrics"] and "auc_ci" in summary

    # → app render fns (the §3 chain's last hop; serve/app.py helpers)
    from tpudf.serve.app import (gauge_html, metrics_html, report_json_file,
                                 verdict_html)
    rep = reports[0]
    assert "<div" in verdict_html(rep)
    assert "%" in gauge_html(rep["final_prob"])
    assert "<table" in metrics_html(rep) or "<div" in metrics_html(rep)
    jf = report_json_file(rep)
    assert os.path.exists(jf) and json.load(open(jf))


def test_c_mtl_trainer(hf_ckpts, sid_dir, tmp_path):
    """§3(c): MTL trainer with the real-format backbone checkpoint."""
    from tpudf.cli.train_mtl import main
    cmds = _cert_commands()
    mtl = _find(cmds, "tpudf.cli.train_mtl")
    save = str(tmp_path / "mtl")
    argv = _adapt(mtl, {"siglip_vision.safetensors": hf_ckpts["test-32"]}, {
        "--model_size": "test-32", "--image_size": 32,
        "--seg_layers": None, "--embed_dim": 32,
        "--freeze_below": 1,             # 2-layer tiny geometry
        "--epochs": 1, "--batch_size": 4, "--data_dir": sid_dir,
        "--save_dir": save, "--no_sweep_mask_thr": None,
    })
    i = argv.index("--seg_layers")
    argv[i + 1:i + 1] = ["0", "-1"]
    main(argv)
    assert os.path.exists(os.path.join(save, "best"))
    assert os.path.exists(os.path.join(save, "training_log.csv"))


def test_d_video_trainer(hf_ckpts, hidf_dir, tmp_path):
    """§3(d): video trainer (+--analysis suite) with the real-format
    backbone checkpoint."""
    from tpudf.cli.train_video import main
    cmds = _cert_commands()
    vid = _find(cmds, "tpudf.cli.train_video")
    save = str(tmp_path / "video")
    argv = _adapt(vid, _subst(hf_ckpts, "", "", hidf=hidf_dir), {
        "--model_size": "test-64", "--num_frames": 4, "--epochs": 2,
        "--batch_size": 2, "--lr": "1e-3", "--save_dir": save, "--seed": 0,
    })
    main(argv)
    assert os.path.exists(os.path.join(save, "best"))
    assert os.path.exists(os.path.join(save, "learning_analysis.json"))


def test_mtl_reference_torch_checkpoint_converts_via_cli(tmp_path):
    """A reference-style MTL `torch.save` dict (compiled-model `_orig_mod.`
    prefixes, siglip2siddataset.py:1147-1156) flows through the convert CLI
    (`python -m tpudf.models.convert --kind mtl`)."""
    from tests.test_mtl_convert import TorchMTL
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16)
    torch.manual_seed(1)
    model = TorchMTL(hf_cfg, seg_layers=(0, -1), embed_dim=16)
    sd = {"_orig_mod." + k: v for k, v in model.state_dict().items()}
    ckpt = str(tmp_path / "mtl_best.pt")
    torch.save({"model": sd, "epoch": 3, "metrics": {"f1": 0.5}}, ckpt)

    from tpudf.models.convert import main as convert_main
    out = str(tmp_path / "converted")
    convert_main(["--src", ckpt, "--out", out, "--kind", "mtl",
                  "--seg_layers", "0,-1", "--embed_dim", "16"])
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["kind"] == "mtl" and cfg["backbone"]["width"] == 64
    assert os.path.isdir(os.path.join(out, "params"))


# -------------------------------------------- optional-artifact rehearsal

def _xgb_save_model_json(path):
    """A genuine xgboost-2.x `Booster.save_model` JSON (the format
    appv3.py:5507-5578 ships as xgb_fusion.json): learner /
    gradient_booster / model / trees with split_indices, split_conditions
    (leaf values in leaf rows), left/right_children (-1 at leaves), and
    the string-typed model params xgboost writes. Two trees over the 19-d
    fusion feature vector."""
    trees = [
        {   # root split on f0 (z_sig) at 0.0 → leaves -1.2 / +1.5
            "base_weights": [0.0, -1.2, 1.5], "categories": [],
            "categories_nodes": [], "categories_segments": [],
            "categories_sizes": [],
            "default_left": [0, 0, 0],
            "left_children": [1, -1, -1], "right_children": [2, -1, -1],
            "loss_changes": [10.0, 0.0, 0.0], "parents": [2147483647, 0, 0],
            "split_conditions": [0.0, -1.2, 1.5],
            "split_indices": [0, 0, 0], "split_type": [0, 0, 0],
            "sum_hessian": [24.0, 12.0, 12.0],
            "tree_param": {"num_deleted": "0", "num_feature": "19",
                           "num_nodes": "3", "size_leaf_vector": "1"},
        },
        {   # f17 < 0.5 → leaf -0.4 ; else f2 < 1.0 → 0.3 / 0.9
            "base_weights": [0.0, -0.4, 0.0, 0.3, 0.9], "categories": [],
            "categories_nodes": [], "categories_segments": [],
            "categories_sizes": [],
            "default_left": [0, 0, 0, 0, 0],
            "left_children": [1, -1, 3, -1, -1],
            "right_children": [2, -1, 4, -1, -1],
            "loss_changes": [8.0, 0.0, 4.0, 0.0, 0.0],
            "parents": [2147483647, 0, 0, 2, 2],
            "split_conditions": [0.5, -0.4, 1.0, 0.3, 0.9],
            "split_indices": [17, 0, 2, 0, 0],
            "split_type": [0, 0, 0, 0, 0],
            "sum_hessian": [24.0, 10.0, 14.0, 7.0, 7.0],
            "tree_param": {"num_deleted": "0", "num_feature": "19",
                           "num_nodes": "5", "size_leaf_vector": "1"},
        },
    ]
    model = {
        "learner": {
            "attributes": {},
            "feature_names": [], "feature_types": [],
            "gradient_booster": {
                "model": {
                    "gbtree_model_param": {"num_parallel_tree": "1",
                                           "num_trees": "2"},
                    "iteration_indptr": [0, 1, 2],
                    "tree_info": [0, 0],
                    "trees": trees,
                },
                "name": "gbtree",
            },
            "learner_model_param": {"base_score": "5E-1",
                                    "boost_from_average": "1",
                                    "num_class": "0", "num_feature": "19",
                                    "num_target": "1"},
            "objective": {"name": "binary:logistic",
                          "reg_loss_param": {"scale_pos_weight": "1"}},
        },
        "version": [2, 0, 3],
    }
    with open(path, "w") as f:
        json.dump(model, f)


def _xgb_expected_margin(x):
    """Host reference walk of the fixture trees (base_score 0.5 → margin 0)."""
    out = np.zeros(len(x))
    for i, row in enumerate(x):
        t0 = -1.2 if row[0] < 0.0 else 1.5
        if row[17] < 0.5:
            t1 = -0.4
        else:
            t1 = 0.3 if row[2] < 1.0 else 0.9
        out[i] = t0 + t1
    return out


def test_xgb_fixture_parses_and_matches_host_walk(tmp_path):
    """TreeEnsemble.from_xgboost_json on the real save_model format +
    platt.json, cross-checked against a host tree walk."""
    from tpudf.models.fusion import TreeEnsemble
    xgb_path = str(tmp_path / "xgb_fusion.json")
    _xgb_save_model_json(xgb_path)
    platt_path = str(tmp_path / "platt.json")
    with open(platt_path, "w") as f:
        json.dump({"a": 1.2, "b": -0.1}, f)
    ens = TreeEnsemble.from_xgboost_json(xgb_path, platt_path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 19)).astype(np.float32)
    want = _xgb_expected_margin(x)
    np.testing.assert_allclose(np.asarray(ens.margins(x)), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ens.predict_proba(x)),
        1.0 / (1.0 + np.exp(-(1.2 * want - 0.1))), atol=1e-5)


def test_xgb_platt_override_reaches_reports(trained_a, hf_ckpts, cifake_dir,
                                            run_dir, artifacts_dir,
                                            tmp_path, capsys):
    """The reference's optional booster override (appv3.py:5576-5578):
    when xgb_fusion.json + platt.json sit in the artifact dir, full
    reports carry the booster's fusion probability."""
    import shutil

    from tpudf.cli.infer import main
    art = str(tmp_path / "art_xgb")
    shutil.copytree(artifacts_dir, art)
    _xgb_save_model_json(os.path.join(art, "xgb_fusion.json"))
    with open(os.path.join(art, "platt.json"), "w") as f:
        json.dump({"a": 1.1, "b": 0.05}, f)

    out_path = str(tmp_path / "xgb_reports.jsonl")
    cmds = _cert_commands()
    infer = _find(cmds, "tpudf.cli.infer")
    argv = _adapt(infer, _subst(hf_ckpts, cifake_dir, run_dir), {
        "--model_size": "test-64", "--batch_size": 16,
        "--out": out_path, "--artifacts": art, "--seed": 0,
    })
    main(argv)
    assert "booster attached" in capsys.readouterr().out
    reports = [json.loads(x) for x in open(out_path)]
    assert reports and all(r.get("xgb_fusion_prob") is not None
                           for r in reports)
    assert all(0.0 <= r["xgb_fusion_prob"] <= 1.0 for r in reports)


def test_bayes_calibration_fit_load_roundtrip(tmp_path):
    """bayes_calibration.json fit → dump → load → identical fused output
    (the cli/infer artifact hook)."""
    from tpudf.fuse.bayesian import (BayesCalibration, bayesian_fuse_v2,
                                     fit_bayes_calibration)
    rng = np.random.default_rng(0)
    n = 200
    y = (rng.random(n) > 0.5).astype(np.float64)
    feats = {
        "visual": np.clip(0.5 + 0.3 * (y - 0.5) + 0.2 * rng.standard_normal(n), 0, 1),
        "freq": np.clip(0.5 + 0.2 * (y - 0.5) + 0.2 * rng.standard_normal(n), 0, 1),
        "forensic": np.clip(rng.random(n), 0, 1),
    }
    for mode in ("isotonic", "logistic"):
        cal = fit_bayes_calibration(feats, y, mode=mode)
        p = str(tmp_path / f"bayes_calibration_{mode}.json")
        with open(p, "w") as f:
            json.dump(cal.to_json(), f)
        with open(p) as f:
            cal2 = BayesCalibration.from_json(json.load(f))
        test_feats = {k: v[:16] for k, v in feats.items()}
        a = bayesian_fuse_v2(test_feats, calibration=cal)
        b = bayesian_fuse_v2(test_feats, calibration=cal2)
        key = ("posterior_fake" if mode == "isotonic"
               else "logistic_posterior")
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), atol=1e-6)
        # the calibrated fit must actually move/extend the output
        c = bayesian_fuse_v2(test_feats)
        if mode == "isotonic":
            assert not np.allclose(np.asarray(a[key]), np.asarray(c[key]))
        else:
            assert key not in c


@pytest.mark.parametrize("geometry", ["large-384", "so400m-512"])
def test_infer_production_geometry_int8_tome(geometry, hf_ckpts, cifake_dir,
                                             tmp_path, monkeypatch, capsys):
    """§3(b) at the PRODUCTION backbone geometries (appv3.py:1223 ViT-L-384;
    cifake MODEL_CONFIGS so400m-512): real width/heads/mlp/patch/image-size
    through `cli/infer --int8 --tome_r` — only the layer count is scaled
    down (2) so the CPU rehearsal stays tractable; the so400m row exercises
    the 72-dim-head lane padding + 4304-wide MLP quantization path."""
    import dataclasses

    from tpudf.cli.infer import main
    from tpudf.models import siglip as siglip_mod

    real = siglip_mod.CONFIGS[geometry]
    monkeypatch.setitem(siglip_mod.CONFIGS, geometry,
                        dataclasses.replace(real, layers=2))
    # 2 images per class keep the 512px CPU rehearsal under a minute
    import shutil
    inp = tmp_path / "imgs"
    for cls in ("REAL", "FAKE"):
        (inp / cls).mkdir(parents=True)
        for i in range(2):
            shutil.copy(os.path.join(cifake_dir, "test", cls, f"{i}.png"),
                        inp / cls / f"{i}.png")
    out_path = str(tmp_path / "reports.jsonl")
    main(["--input", str(inp), "--out", out_path,
          "--model_size", geometry, "--batch_size", "4", "--fast",
          "--int8", "--tome_r", "--labels_from_dirs", "--seed", "0"])
    reports = [json.loads(x) for x in open(out_path)]
    assert len(reports) == 4
    assert all(np.isfinite(r["final_prob"]) for r in reports)
