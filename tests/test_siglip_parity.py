"""Numerical parity of the tpudf SigLIP tower vs HF SiglipVisionModel.

The north star demands HuggingFace-equivalent outputs (BASELINE.json). These
tests build a small random-init HF SiglipVisionModel on torch-CPU, convert the
weights, and compare forwards in f32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpudf.core.precision import F32_POLICY
from tpudf.models.convert import config_from_hf, from_hf_state_dict
from tpudf.models.siglip import siglip_forward


def _make_hf(image_size=32, hidden=64, layers=2, heads=2, inter=128):
    cfg = transformers.SiglipVisionConfig(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        image_size=image_size, patch_size=16)
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def hf_pair():
    model, hf_cfg = _make_hf()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def _pixels(rng, b, s):
    return rng.standard_normal((b, s, s, 3)).astype(np.float32)


def test_pooled_and_tokens_match(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    x = _pixels(rng, 2, 32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    ours = siglip_forward(params, jnp.asarray(x), cfg, F32_POLICY,
                          output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(ours["tokens"]), out.last_hidden_state.numpy(),
        atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), out.pooler_output.numpy(),
        atol=2e-5, rtol=2e-5)


def test_hidden_states_match(hf_pair):
    """Per-layer hidden states must match — the MTL segmentation decoder taps
    them (ref siglip2siddataset.py:765-785)."""
    model, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    x = _pixels(rng, 1, 32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    ours = siglip_forward(params, jnp.asarray(x), cfg, F32_POLICY,
                          output_hidden_states=True)
    assert len(ours["hidden_states"]) == len(out.hidden_states)
    for i, (a, b) in enumerate(zip(ours["hidden_states"], out.hidden_states)):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   atol=2e-5, rtol=2e-5, err_msg=f"layer {i}")


def test_interpolate_pos_encoding(hf_pair):
    """Variable-resolution forward (ref siglip2siddataset.py:770)."""
    model, cfg, params = hf_pair
    rng = np.random.default_rng(2)
    x = _pixels(rng, 1, 48)          # 3x3 grid vs trained 2x2
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    interpolate_pos_encoding=True)
    ours = siglip_forward(params, jnp.asarray(x), cfg, F32_POLICY)
    np.testing.assert_allclose(
        np.asarray(ours["tokens"]), out.last_hidden_state.numpy(),
        atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("name,hidden,layers,heads,inter,img", [
    # base-384 full geometry (576 tokens)
    ("base-384", 768, 12, 12, 3072, 384),
    # so400m geometry: width 1152, 16 heads → head_dim 72 (the Pallas
    # lane-padding case), full 27 layers, reduced image for CPU runtime
    ("so400m-27L", 1152, 27, 16, 4304, 128),
])
def test_large_geometry_parity(name, hidden, layers, heads, inter, img):
    """VERDICT r1 item 6: conversion + forward parity at production
    geometries, not just the tiny test config (ref appv3.py:1223 towers)."""
    model, hf_cfg = _make_hf(image_size=img, hidden=hidden, layers=layers,
                             heads=heads, inter=inter)
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    rng = np.random.default_rng(7)
    x = _pixels(rng, 1, img)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = siglip_forward(params, jnp.asarray(x), cfg, F32_POLICY)
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), out.pooler_output.numpy(),
        atol=5e-4, rtol=5e-4, err_msg=name)


def test_convert_cli_roundtrip(tmp_path):
    """python -m tpudf.models.convert: HF safetensors dir → orbax + config,
    restored params reproduce the converted forward."""
    from safetensors.numpy import save_file
    from tpudf.models.convert import main as convert_main
    from tpudf.train.checkpoint import restore_checkpoint

    model, hf_cfg = _make_hf()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    src = tmp_path / "hf_model"
    src.mkdir()
    save_file(sd, str(src / "model.safetensors"))
    out = tmp_path / "converted"
    convert_main(["--src", str(src), "--out", str(out), "--kind", "hf"])

    import json
    cfg_json = json.loads((out / "config.json").read_text())
    assert cfg_json["kind"] == "hf"
    assert cfg_json["backbone"]["width"] == 64
    assert cfg_json["backbone"]["layers"] == 2
    assert cfg_json["backbone"]["image_size"] == 32

    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    restored = restore_checkpoint(str(out / "params"), params)
    rng = np.random.default_rng(8)
    x = _pixels(rng, 1, 32)
    a = siglip_forward(params, jnp.asarray(x), cfg, F32_POLICY)["pooled"]
    b = siglip_forward(restored, jnp.asarray(x), cfg, F32_POLICY)["pooled"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_infer_config_from_state_dict():
    """Geometry auto-detection (checkpoint shape detection family,
    inference_ai_human_images.py:804-827)."""
    from tpudf.models.convert import _infer_config
    model, hf_cfg = _make_hf(image_size=48, hidden=64, layers=2, heads=2,
                             inter=128)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = _infer_config(sd)
    assert cfg.width == 64 and cfg.layers == 2
    assert cfg.image_size == 48 and cfg.patch_size == 16
    assert cfg.mlp_dim == 128


def test_frozen_prefix_layer_count_mismatch_raises():
    """quantize_frozen_prefix(freeze_below=A) paired with stop_grad_below=B
    != A must raise instead of silently running layers twice."""
    import jax
    import pytest
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward

    cfg = CONFIGS["test-32"]
    params = init_siglip(jax.random.key(0), cfg)
    # a fake quantized prefix holding ONE layer while stop_grad_below=2
    frozen_q = jax.tree.map(lambda a: a[:1], params["blocks"])
    pixels = jax.numpy.zeros((1, cfg.image_size, cfg.image_size, 3))
    with pytest.raises(ValueError, match="freeze boundary"):
        siglip_forward(params, pixels, cfg, DEFAULT_POLICY,
                       stop_grad_below=2, frozen_blocks_q=frozen_q)
