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
