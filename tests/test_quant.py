"""Int8 inference quantization tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.core.precision import F32_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.ops.quant import (int8_matmul, quantize_siglip, quantize_weight)


def test_int8_matmul_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (128, 256)), jnp.float32)
    wq = quantize_weight(w)
    ref = np.asarray(x @ w)
    got = np.asarray(int8_matmul(x, wq, jnp.float32))
    # int8 dynamic-range error ~1%
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.02


def test_quantized_backbone_cosine():
    cfg = CONFIGS["test-32"]
    bb = init_siglip(jax.random.key(0), cfg)
    qbb = quantize_siglip(bb)
    px = jnp.asarray(np.random.default_rng(0)
                     .random((4, 32, 32, 3)), jnp.float32)
    ref = np.asarray(siglip_forward(bb, px, cfg, F32_POLICY)["pooled"])
    out = np.asarray(siglip_forward(qbb, px, cfg, F32_POLICY)["pooled"])
    cos = np.sum(ref * out, 1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1))
    assert cos.min() > 0.995


def test_int8_matmul_static_close():
    from tpudf.ops.quant import int8_matmul_static
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (128, 256)), jnp.float32)
    wq = quantize_weight(w)
    s = jnp.max(jnp.abs(x))
    ref = np.asarray(x @ w)
    got = np.asarray(int8_matmul_static(x, wq, s, jnp.float32))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.03


def test_static_quantized_backbone_cosine():
    """Calibrated W8A8 tower tracks the float tower (PTQ accuracy bar)."""
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)
    cfg = CONFIGS["test-32"]
    bb = init_siglip(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    calib = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    scales = calibrate_siglip_act_scales(bb, cfg, calib, F32_POLICY)
    for k in ("qkv", "out", "fc1", "fc2"):
        assert scales[k].shape == (cfg.layers,)
        assert float(scales[k].min()) > 0
    qbb = quantize_siglip_static(bb, scales)

    px = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    ref = np.asarray(siglip_forward(bb, px, cfg, F32_POLICY)["pooled"])
    out = np.asarray(siglip_forward(qbb, px, cfg, F32_POLICY)["pooled"])
    cos = np.sum(ref * out, 1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1))
    assert cos.min() > 0.99


def test_engine_quantize_tracks_float():
    """DetectEngine.quantize() (serving W8A8 deploy config) keeps p_blend
    close to the float engine on the fast path."""
    from tpudf.calib.coral import CoralCutpoints
    from tpudf.models.freq_mlp import init_freq_mlp
    from tpudf.models.fusion import init_fusion_linear
    from tpudf.models.heads import init_binary_head
    from tpudf.serve.engine import DetectEngine

    cfg = CONFIGS["test-32"]
    k = jax.random.split(jax.random.key(3), 4)
    mk = lambda: DetectEngine(cfg, init_siglip(k[0], cfg),
                              init_binary_head(k[1], cfg.width),
                              init_freq_mlp(k[2]), init_fusion_linear(k[3]),
                              CoralCutpoints.default(), policy=F32_POLICY)
    rng = np.random.default_rng(0)
    img = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    ref = mk().predict_batch_fast(img)["p_blend"]
    eng = mk().quantize()
    assert "act_scales" in eng.backbone["blocks"]
    got = eng.predict_batch_fast(img)["p_blend"]
    np.testing.assert_allclose(got, ref, atol=0.05)
    # idempotent
    eng.quantize()


@pytest.mark.parametrize("width,layers,heads,mlp,img", [
    (256, 2, 2, 512, 32),      # base-like: head_dim 128, lane-aligned
    (144, 2, 2, 304, 32),      # so400m-like ratios: head_dim 72 (odd lane),
                               # mlp not 128-aligned -> every kernel falls
                               # back to its XLA twin
])
def test_static_quant_geometries(width, layers, heads, mlp, img):
    """The static-int8 path must produce float-tracking output for both
    lane-aligned and fallback geometries (so400m head_dim=72 takes the XLA
    twins end to end)."""
    from tpudf.models.siglip import SigLIPConfig
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)

    cfg = SigLIPConfig(width, layers, heads, mlp, img, 16)
    bb = init_siglip(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    calib = jnp.asarray(rng.random((4, img, img, 3)), jnp.float32)
    scales = calibrate_siglip_act_scales(bb, cfg, calib, F32_POLICY)
    qbb = quantize_siglip_static(bb, scales)
    px = jnp.asarray(rng.random((2, img, img, 3)), jnp.float32)
    ref = np.asarray(siglip_forward(bb, px, cfg, F32_POLICY)["pooled"])
    out = np.asarray(siglip_forward(qbb, px, cfg, F32_POLICY)["pooled"])
    cos = np.sum(ref * out, 1) / (np.linalg.norm(ref, axis=1)
                                  * np.linalg.norm(out, axis=1))
    assert cos.min() > 0.98


def test_prepad_matches_in_graph_padding():
    """prepad_siglip_static (one-time weight lane-alignment at quantize
    time) must produce EXACTLY the forward of the un-prepadded tree, whose
    _block_apply pads the same weights in-graph (so400m-like head_dim=72
    and a non-128-aligned MLP hidden dim exercise both pad families)."""
    from tpudf.models.siglip import SigLIPConfig
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 prepad_siglip_static,
                                 quantize_siglip_static)

    cfg = SigLIPConfig(144, 2, 2, 304, 32, 16)
    bb = init_siglip(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    scales = calibrate_siglip_act_scales(bb, cfg, calib, F32_POLICY)
    qbb = quantize_siglip_static(bb, scales)
    pre = prepad_siglip_static(qbb, cfg)
    # padded shapes: head 72 -> 128 slots, mlp 304 -> 384
    assert pre["blocks"]["attn"]["qkv_w"]["q"].shape[-1] == 3 * 2 * 128
    assert pre["blocks"]["mlp"]["fc1_w"]["q"].shape[-1] == 384
    # idempotent
    pre2 = prepad_siglip_static(pre, cfg)
    assert (pre2["blocks"]["attn"]["qkv_w"]["q"].shape
            == pre["blocks"]["attn"]["qkv_w"]["q"].shape)
    px = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    a = np.asarray(siglip_forward(qbb, px, cfg, F32_POLICY)["pooled"])
    b = np.asarray(siglip_forward(pre, px, cfg, F32_POLICY)["pooled"])
    np.testing.assert_array_equal(a, b)
