"""Report-level golden corpus (r3 verdict item 6).

Pins the COMPLETE ~50-signal JSON report for a fixed set of synthetic
images and one clip, through both the fast and full paths and both engine
configs (float and int8+ToMe) — so any wiring drift anywhere in
engine → forensics → fusion → cascade → verdict breaks a test, not just
sub-component parity (ref appv3.py:6112-6164, the report JSON the app
serves).

Goldens live in tests/goldens/report_golden.json, generated on the same
virtual-CPU platform the suite runs on (conftest pins matmul precision
highest, so numerics are reproducible). Regenerate after an INTENDED
change with:

    TPUDF_REGEN_GOLDENS=1 python -m pytest tests/test_report_golden.py -q

and review the JSON diff like code.
"""

import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens", "report_golden.json")
REGEN = os.environ.get("TPUDF_REGEN_GOLDENS") == "1"

RTOL, ATOL = 2e-3, 2e-4   # float drift budget (platform/jax-version noise)


def _images(n=3, size=64):
    """Structured fixtures — gradients + texture + an edited-looking patch
    so the forensic battery sees non-degenerate statistics."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:size, 0:size] / size
    out = []
    for i in range(n):
        base = 0.45 + 0.3 * np.sin((2 + i) * yy + (3 - i) * xx)[..., None] \
            * np.ones((1, 1, 3))
        tex = 0.08 * np.sign(np.sin(xx * np.pi * (8 + 8 * i))
                             * np.cos(yy * np.pi * 16))[..., None]
        img = base + tex + 0.05 * rng.standard_normal((size, size, 3))
        if i == 2:                       # pasted flat patch (tamper-ish)
            img[20:44, 20:44] = img[20:44, 20:44].mean((0, 1))
        out.append(np.clip(img, 0, 1))
    return (np.stack(out) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def engines():
    import jax

    from tpudf.calib.coral import CoralCutpoints
    from tpudf.models.freq_mlp import init_freq_mlp
    from tpudf.models.fusion import init_fusion_linear
    from tpudf.models.heads import init_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.serve.engine import DetectEngine

    cfg = CONFIGS["test-64"]
    ks = jax.random.split(jax.random.key(11), 4)

    def make(**kw):
        return DetectEngine(cfg=cfg, backbone=init_siglip(ks[0], cfg),
                            head=init_binary_head(ks[1], cfg.width),
                            freq=init_freq_mlp(ks[2]),
                            fusion=init_fusion_linear(ks[3]),
                            cuts=CoralCutpoints.default(), **kw)

    float_eng = make()
    from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
    deployed = make(tome_r=DEPLOYED_TOME_R,
                    tome_floor=deployed_floor(cfg.grid * cfg.grid))
    deployed.quantize(_images(4))
    return {"float": float_eng, "int8_tome": deployed}


def _corpus(engines):
    """name → report dict, covering fast/full × float/int8+ToMe + video."""
    from tpudf.serve.report import predict_images, predict_video
    imgs = _images()
    out = {}
    for eng_name, eng in engines.items():
        for fast in (True, False):
            reports = predict_images(eng, imgs, fast=fast)
            for i, r in enumerate(reports):
                out[f"{eng_name}.{'fast' if fast else 'full'}.img{i}"] = r
    # one deterministic 6-frame clip through the video path (float engine;
    # flow/face batteries covered — landmark params resolve from the
    # packaged asset deterministically)
    frames = np.stack([np.roll(_images(1, 64)[0], 2 * t, axis=1)
                       for t in range(6)])
    out["float.video"] = predict_video(engines["float"], frames)
    return out


def _compare(path, got, want, errors):
    if isinstance(want, dict):
        if not isinstance(got, dict):
            errors.append(f"{path}: type {type(got).__name__} != dict")
            return
        for k in want:
            if k not in got:
                errors.append(f"{path}.{k}: MISSING from report")
            else:
                _compare(f"{path}.{k}", got[k], want[k], errors)
        for k in got:
            if k not in want:
                errors.append(f"{path}.{k}: NEW key (regen goldens if "
                              "intended)")
    elif isinstance(want, list):
        if not isinstance(got, list) or len(got) != len(want):
            errors.append(f"{path}: list shape {len(got) if isinstance(got, list) else got} != {len(want)}")
            return
        for i, (g, w) in enumerate(zip(got, want)):
            _compare(f"{path}[{i}]", g, w, errors)
    elif isinstance(want, float):
        g = float(got)
        if not (np.isnan(g) and np.isnan(want)) and \
                abs(g - want) > ATOL + RTOL * abs(want):
            errors.append(f"{path}: {g!r} != {want!r}")
    elif got != want:
        errors.append(f"{path}: {got!r} != {want!r}")


def _jsonable(x):
    return json.loads(json.dumps(x, default=float))


def test_reports_match_goldens(engines):
    got = _jsonable(_corpus(engines))
    if REGEN or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"goldens regenerated → {GOLDEN_PATH}")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    errors = []
    for name in want:
        if name not in got:
            errors.append(f"{name}: report not produced")
        else:
            _compare(name, got[name], want[name], errors)
    for name in got:
        if name not in want:
            errors.append(f"{name}: new report config (regen goldens)")
    assert not errors, "report drift vs goldens:\n" + "\n".join(errors[:40])


def test_golden_coverage():
    """The goldens must stay a FULL-surface pin: the full-path image report
    carries the signal battery and the video report the temporal battery."""
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    full = want["float.full.img0"]
    assert len(full) >= 80, f"full report shrank: {len(full)} keys"
    for key in ("final_label", "final_prob", "verdict", "risk_level",
                "risk_probs", "bayesian_fusion_posterior",
                "dirichlet_uncertainty", "generator_likelihood",
                "patch_probs", "three_way", "label_trace"):
        assert key in full, key
    vid = want["float.video"]
    assert "temporal_signals" in vid and "frame_probs" in vid
    assert len(vid["temporal_signals"]) >= 15, len(vid["temporal_signals"])
    assert "chosen_frame_report" in vid
