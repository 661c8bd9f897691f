"""Deeper ToMe on the patch-grid views (serve/engine._detect_batch
patch_tome_r/patch_tome_floor; ops/tome.py DEPLOYED_PATCH_*).

Patch tiles are 4x-upscaled crops — the deployed patch schedule merges
their tokens harder to buy back their ~60% share of the full-analysis
tower work. These tests bound the fidelity cost: the main detection path
must be EXACTLY unchanged, and the patch localization signals must stay
faithful (top-patch agreement + end-task separation)."""

import numpy as np
import pytest

import jax

from tpudf.calib.coral import CoralCutpoints
from tpudf.core.precision import F32_POLICY
from tpudf.models.freq_mlp import init_freq_mlp
from tpudf.models.fusion import init_fusion_linear
from tpudf.models.heads import init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip
from tpudf.ops.tome import (DEPLOYED_PATCH_TOME_R, DEPLOYED_TOME_R,
                            deployed_floor, deployed_patch_floor)
from tpudf.serve.engine import DetectEngine


def _images(n_per_class=8, size=64):
    """Texture-separable REAL/FAKE (test_train_infer_e2e construction) with
    the checkerboard artifact confined to ONE quadrant of the fakes, so
    the patch grid has a localization ranking worth preserving."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs, labels = [], []
    for cls in (0.0, 1.0):
        for i in range(n_per_class):
            a, b = rng.uniform(2, 7, 2)
            base = 0.5 + 0.2 * (np.sin(a * yy + b * xx)[..., None]
                                * np.ones((1, 1, 3)))
            img = base + 0.05 * rng.standard_normal((size, size, 3))
            if cls == 1.0:
                tex = 0.2 * np.sign(np.sin(xx * np.pi * 32)
                                    * np.cos(yy * np.pi * 32))[..., None]
                h = size // 2
                img[:h, :h] += tex[:h, :h]
            imgs.append(np.clip(img, 0, 1))
            labels.append(cls)
    return (np.stack(imgs) * 255).astype(np.uint8), np.asarray(labels)


@pytest.fixture(scope="module")
def engines():
    cfg = CONFIGS["test-64"]
    ks = jax.random.split(jax.random.key(3), 4)
    base = dict(cfg=cfg, backbone=init_siglip(ks[0], cfg),
                head=init_binary_head(ks[1], cfg.width),
                freq=init_freq_mlp(ks[2]),
                fusion=init_fusion_linear(ks[3]),
                cuts=CoralCutpoints.default(), policy=F32_POLICY,
                tome_r=DEPLOYED_TOME_R,
                tome_floor=deployed_floor(cfg.grid * cfg.grid))
    exact = DetectEngine(**base)
    deep = DetectEngine(**base, patch_tome_r=DEPLOYED_PATCH_TOME_R,
                        patch_tome_floor=deployed_patch_floor(
                            cfg.grid * cfg.grid))
    return exact, deep


def test_main_path_bit_identical(engines):
    """The deeper patch schedule must not touch the main detection path:
    crops/TTA/fusion outputs are identical to the exact engine's."""
    exact, deep = engines
    px, _ = _images(4)
    a = exact.predict_batch(px)
    b = deep.predict_batch(px)
    for key in ("p_blend", "z_sig", "z_freq", "visual_prob", "entropy",
                "embed_l2"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)


def test_patch_signals_stay_faithful(engines):
    exact, deep = engines
    px, labels = _images(8)
    a = exact.predict_batch(px)
    b = deep.predict_batch(px)

    # end-task separation via the patch channel must survive
    from tpudf.eval.metrics import roc_auc
    auc_a = roc_auc(labels, a["max_patch"])
    auc_b = roc_auc(labels, b["max_patch"])
    assert auc_b >= auc_a - 0.05, (auc_a, auc_b)

    # localization: the artifact quadrant's top patch under the exact
    # schedule stays in the deep schedule's top quartile for most fakes
    pa = np.asarray(a["patch_probs"])
    pb = np.asarray(b["patch_probs"])
    fakes = labels == 1.0
    hits = 0
    for i in np.flatnonzero(fakes):
        top_exact = int(np.argmax(pa[i]))
        hits += int(top_exact in np.argsort(-pb[i])[:4])
    assert hits >= int(0.7 * fakes.sum()), (hits, int(fakes.sum()))

    # probabilities stay in the same regime (no wholesale drift)
    assert np.mean(np.abs(pa - pb)) < 0.15


def test_deployed_combo_int8_patch_deep(engines):
    """The full deployed serving combo — W8A8 int8 tower + main ToMe +
    deep patch ToMe — keeps end-task separation via the patch channel."""
    cfg = CONFIGS["test-64"]
    ks = jax.random.split(jax.random.key(3), 4)
    deep_q = DetectEngine(
        cfg=cfg, backbone=init_siglip(ks[0], cfg),
        head=init_binary_head(ks[1], cfg.width), freq=init_freq_mlp(ks[2]),
        fusion=init_fusion_linear(ks[3]), cuts=CoralCutpoints.default(),
        policy=F32_POLICY, tome_r=DEPLOYED_TOME_R,
        tome_floor=deployed_floor(cfg.grid * cfg.grid),
        patch_tome_r=DEPLOYED_PATCH_TOME_R,
        patch_tome_floor=deployed_patch_floor(cfg.grid * cfg.grid))
    px, labels = _images(8)
    deep_q.quantize(px[:8])
    out = deep_q.predict_batch(px)
    exact, _ = engines
    ref = exact.predict_batch(px)
    from tpudf.eval.metrics import roc_auc
    auc_q = roc_auc(labels, out["max_patch"])
    auc_ref = roc_auc(labels, ref["max_patch"])
    assert auc_q >= auc_ref - 0.08, (auc_q, auc_ref)
